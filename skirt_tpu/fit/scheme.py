"""The fit scheme driver.

ref: FitSKIRTcore/OligoFitScheme.cpp (runSelf: GA initialize +
step-until-done; objective() runs an adjusted simulation per genome and
computes chi2 over the reference images) and FitSkirtMain.  The reference
farms genome evaluations to MPI slaves through MasterSlaveCommunicator
(Optimization.cpp:223-251); here evaluations run through a user-supplied
`simulate(params) -> list of per-component frames` callable (which can
batch forward runs across devices).
"""

from __future__ import annotations

import os

import numpy as np

from ..log import Log, SilentLog
from .ga import SteadyStateGA


class FitScheme:
    """Genetic fit of simulation parameters against reference images.

    simulate(params_dict) -> list over reference images of lists of
    per-luminosity-component frames (each a (ny, nx) array in the reference
    image units, simulated at unit component luminosity).
    """

    def __init__(self, *, ranges, reference_images, simulate=None,
                 simulate_batch=None, generations: int = 100,
                 popsize: int = 100,
                 pmut: float = 0.03, pcross: float = 0.65,
                 fixed_seed: bool = True, log: Log | None = None,
                 out_dir: str = ".", prefix: str = "fit"):
        if simulate is None and simulate_batch is None:
            raise ValueError("provide simulate or simulate_batch")
        self.ranges = list(ranges)
        self.reference_images = list(reference_images)
        self.simulate = simulate
        # batched population evaluation replaces the reference's
        # MasterSlaveCommunicator task farm (MasterSlaveCommunicator.cpp:175
        # performTask over serialized genomes): the caller can vmap or shard
        # the forward runs over devices and return one result per genome
        self.simulate_batch = simulate_batch
        self.generations = int(generations)
        self.log = log or SilentLog()
        self.out_dir = out_dir
        self.prefix = prefix
        self.ga = SteadyStateGA(self.ranges, popsize=popsize, pmut=pmut,
                                pcross=pcross,
                                seed=4357 if fixed_seed else None)
        self.history = []  # (generation, best_params, best_chi2)

    def _params_dict(self, genome: np.ndarray) -> dict:
        return {r.label: float(v) for r, v in zip(self.ranges, genome)}

    def _evaluate(self, genome: np.ndarray) -> float:
        """ref: OligoFitScheme::objective + Optimization::chi2 — sum of
        per-image chi2 values."""
        frames_per_image = self.simulate(self._params_dict(genome))
        return self._chi2_of(frames_per_image)

    def _chi2_of(self, frames_per_image) -> float:
        total = 0.0
        for ref, frames in zip(self.reference_images, frames_per_image):
            chi, _lums = ref.chi2(frames)
            total += chi
        return total

    def _evaluate_all(self, genomes) -> np.ndarray:
        """Score a population; dispatches one batched call when available.

        ref: Optimization.cpp:223-251 splitChi — the GA population is
        evaluated in parallel through MasterSlaveCommunicator::performTask;
        here a single simulate_batch call carries the whole population so
        the forward models can run device-parallel.
        """
        if self.simulate_batch is not None:
            results = self.simulate_batch(
                [self._params_dict(g) for g in genomes])
            return np.array([self._chi2_of(r) for r in results])
        return np.array([self._evaluate(g) for g in genomes])

    def run(self):
        """ref: OligoFitScheme::runSelf — initialize, then step until done."""
        pop = self.ga.initialize()
        self.ga.scores = self._evaluate_all(pop)
        for gen in range(self.generations):
            children = self.ga.offspring()
            child_scores = self._evaluate_all(children)
            self.ga.incorporate(children, child_scores)
            best, score = self.ga.best
            self.history.append((gen, self._params_dict(best), score))
            self.log.info(f"generation {gen}: best chi2 {score:.6g} "
                          f"at {self._params_dict(best)}")
            self._write_best(gen, best, score)
        best, score = self.ga.best
        return self._params_dict(best), score

    def _write_best(self, gen: int, best: np.ndarray, score: float):
        """ref: Optimization.cpp:262-286 best-per-generation output files."""
        os.makedirs(self.out_dir, exist_ok=True)
        path = os.path.join(self.out_dir, f"{self.prefix}_best.dat")
        mode = "w" if gen == 0 else "a"
        with open(path, mode) as f:
            vals = " ".join(f"{v:.8e}" for v in best)
            f.write(f"{gen} {vals} {score:.8e}\n")
