"""Steady-state real-coded genetic algorithm.

ref: FitSKIRTcore/Optimization.cpp:55-60 wraps GAlib's GASteadyStateGA
over GARealGenome with popsize/generations/pmut/pcross properties
(Optimization.hpp:29-52, defaults 100/100/0.03/0.65) and optional fixed
seed 4357 (:156-163).  This is a clean-room steady-state GA with blend
(BLX-alpha) crossover and bounded Gaussian mutation — the operators GAlib
uses by default for real genomes.
"""

from __future__ import annotations

import numpy as np


class SteadyStateGA:
    def __init__(self, ranges, *, popsize: int = 100, pmut: float = 0.03,
                 pcross: float = 0.65, replacement_fraction: float = 0.25,
                 seed: int | None = 4357):
        self.ranges = list(ranges)
        self.nparams = len(self.ranges)
        self.popsize = int(popsize)
        self.pmut = float(pmut)
        self.pcross = float(pcross)
        self.nreplace = max(int(replacement_fraction * popsize), 2)
        self.rng = np.random.default_rng(seed)
        self.lo = np.array([r.minimum for r in self.ranges])
        self.hi = np.array([r.maximum for r in self.ranges])
        self.population = None     # (pop, nparams)
        self.scores = None         # (pop,) chi2, lower is better
        self.generation = 0

    def initialize(self):
        u = self.rng.uniform(size=(self.popsize, self.nparams))
        self.population = self.lo + u * (self.hi - self.lo)
        self.scores = np.full(self.popsize, np.inf)
        self.generation = 0
        return self.population.copy()

    def _select(self) -> np.ndarray:
        """Binary tournament on current scores."""
        i, j = self.rng.integers(self.popsize, size=2)
        return self.population[i if self.scores[i] <= self.scores[j] else j]

    def offspring(self) -> np.ndarray:
        """Propose nreplace children from the scored population."""
        children = np.empty((self.nreplace, self.nparams))
        for c in range(self.nreplace):
            mom = self._select()
            dad = self._select()
            if self.rng.uniform() < self.pcross:
                # BLX-alpha blend crossover (GARealGenome default family)
                alpha = 0.5
                lo = np.minimum(mom, dad)
                hi = np.maximum(mom, dad)
                span = hi - lo
                child = self.rng.uniform(lo - alpha * span, hi + alpha * span)
            else:
                child = mom.copy()
            # Gaussian mutation per gene
            mutate = self.rng.uniform(size=self.nparams) < self.pmut
            sigma = 0.1 * (self.hi - self.lo)
            child = np.where(mutate,
                             child + self.rng.normal(size=self.nparams) * sigma,
                             child)
            children[c] = np.clip(child, self.lo, self.hi)
        return children

    def incorporate(self, children: np.ndarray, child_scores: np.ndarray):
        """Steady-state replacement: children replace the worst individuals
        when better."""
        order = np.argsort(self.scores)[::-1]  # worst first
        k = 0
        for child, score in zip(children, child_scores):
            if k >= order.size:
                break
            worst = order[k]
            if score < self.scores[worst]:
                self.population[worst] = child
                self.scores[worst] = score
                k += 1
        self.generation += 1

    @property
    def best(self):
        i = int(np.argmin(self.scores))
        return self.population[i].copy(), float(self.scores[i])
