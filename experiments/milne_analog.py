"""Independent analog MC for the Chandrasekhar Milne problem (numpy).

Semi-infinite (tau=12 slab) conservative Thomson atmosphere, isotropic
source at the bottom; ANALOG transport (exponential free paths, no
forced scattering, no peel-off, no weights).  Escaping photons bin their
Stokes vectors by mu; p(mu->0) must approach 11.713% (Chandrasekhar
1960, Table XXIV).

This is the arbiter for the engine's polarized chain: same physics,
none of the engine's estimator machinery.
"""

import numpy as np

rng = np.random.default_rng(7)
N = 400_000
TAU = 12.0

# Thomson Mueller: S11=(1+c^2)/2, S12=-(1-c^2)/2 = (c^2-1)/2, S33=c, S34=0
pos_tau = np.zeros(N)                    # optical depth above the bottom
k = np.zeros((N, 3))
k[:, 2] = 1.0
# isotropic upward launch
mu0 = np.sqrt(rng.random(N))             # isotropic flux-weighted? no:
mu0 = rng.random(N)                      # isotropic intensity: uniform mu
phi0 = 2 * np.pi * rng.random(N)
s0 = np.sqrt(1 - mu0 ** 2)
k = np.stack([s0 * np.cos(phi0), s0 * np.sin(phi0), mu0], axis=-1)
q = np.zeros(N)
u = np.zeros(N)
v = np.zeros(N)
nrm = np.zeros((N, 3))
have_n = np.zeros(N, bool)
alive = np.ones(N, bool)

esc_mu = []
esc_q = []
esc_u = []
esc_n = []
esc_k = []

for step in range(4000):
    if not alive.any():
        break
    idx = np.nonzero(alive)[0]
    # free path in optical depth units
    dtau = -np.log(rng.random(idx.size))
    newtau = pos_tau[idx] + dtau * k[idx, 2] / np.maximum(
        np.abs(k[idx, 2]), 1e-12) * np.abs(k[idx, 2])
    newtau = pos_tau[idx] + dtau * k[idx, 2]
    escaped_top = newtau > TAU
    reflected = newtau < 0.0             # absorbed into the deep source
    # record escapes
    e = idx[escaped_top]
    if e.size:
        esc_mu.append(k[e, 2].copy())
        esc_q.append(q[e].copy())
        esc_u.append(u[e].copy())
        esc_n.append(nrm[e].copy())
        esc_k.append(k[e].copy())
        alive[e] = False
    r = idx[reflected]
    alive[r] = False                     # lost into the lower half-space
    s = idx[~(escaped_top | reflected)]
    pos_tau[s] = newtau[~(escaped_top | reflected)]

    # scatter the survivors
    if s.size == 0:
        continue
    # theta from S11 sin(theta): pdf ~ (1+c^2), sample by rejection
    c = np.empty(s.size)
    todo = np.ones(s.size, bool)
    while todo.any():
        t = np.nonzero(todo)[0]
        cand = 2 * rng.random(t.size) - 1
        acc = rng.random(t.size) < (1 + cand ** 2) / 2
        c[t[acc]] = cand[acc]
        todo[t[acc]] = False
    theta = np.arccos(c)
    S11 = 0.5 * (1 + c ** 2)
    S12 = 0.5 * (c ** 2 - 1)
    S33 = c

    # reference normal: create if unpolarized (Bianchi), else keep
    kk = k[s]
    kz = kk[:, 2]
    safe = np.abs(kz) <= 0.99999
    nz = np.sqrt(np.clip((1 - kz) * (1 + kz), 1e-12, None))
    bian = np.stack([-kk[:, 0] * kz / nz, -kk[:, 1] * kz / nz, nz], -1)
    bian[~safe] = [1.0, 0.0, 0.0]
    n_s = np.where(have_n[s][:, None], nrm[s], bian)

    # phi from 1 + pdeg*(S12/S11)*cos(2(phi-gamma)) by rejection
    pdeg = np.sqrt(q[s] ** 2 + u[s] ** 2)
    gam = 0.5 * np.arctan2(u[s], q[s])
    a = pdeg * S12 / S11
    phi = np.empty(s.size)
    todo = np.ones(s.size, bool)
    while todo.any():
        t = np.nonzero(todo)[0]
        cand = 2 * np.pi * rng.random(t.size)
        acc = rng.random(t.size) * (1 + np.abs(a[t])) \
            < 1 + a[t] * np.cos(2 * (cand - gam[t]))
        phi[t[acc]] = cand[acc]
        todo[t[acc]] = False

    # rotate stokes + normal by phi about k
    c2, s2 = np.cos(2 * phi), np.sin(2 * phi)
    qr = q[s] * c2 + u[s] * s2
    ur = -q[s] * s2 + u[s] * c2
    cp, sp = np.cos(phi)[:, None], np.sin(phi)[:, None]
    n_rot = n_s * cp + np.cross(kk, n_s) * sp
    n_rot /= np.linalg.norm(n_rot, axis=-1, keepdims=True)

    # apply Mueller (normalized)
    I2 = S11 + S12 * qr
    q2 = (S12 + S11 * qr) / I2
    u2 = (S33 * ur) / I2
    v2 = (S33 * v[s]) / I2

    # new direction: rotate k about n_rot by theta
    ct, st_ = np.cos(theta)[:, None], np.sin(theta)[:, None]
    knew = kk * ct + np.cross(n_rot, kk) * st_
    knew /= np.linalg.norm(knew, axis=-1, keepdims=True)

    q[s], u[s], v[s] = q2, u2, v2
    nrm[s] = n_rot
    have_n[s] = True
    k[s] = knew

esc_mu = np.concatenate(esc_mu)
esc_q = np.concatenate(esc_q)
esc_u = np.concatenate(esc_u)
esc_n = np.concatenate(esc_n)
esc_k = np.concatenate(esc_k)

# project Stokes into the observer frame per photon: for photons moving
# near mu, polarization degree relative to the meridian plane.  The
# z-axis projected meridian: reference y-axis = z - (k.z)k normalized
kz = esc_k[:, 2]
mer = np.zeros_like(esc_k)
mer[:, 2] = 1.0
mer = mer - esc_k * kz[:, None]
nn = np.linalg.norm(mer, axis=-1, keepdims=True)
ok = nn[:, 0] > 1e-6
mer = mer / np.maximum(nn, 1e-12)
# the Q component measured with the meridian plane as reference:
# rotate from the photon's normal frame to the meridian-normal frame
mern = np.cross(esc_k, mer)              # normal of the meridian plane
cosa = np.sum(esc_n * mern, axis=-1)
sina = np.sum(np.cross(esc_n, mern) * esc_k, axis=-1)
alpha = np.arctan2(sina, cosa)
c2a, s2a = np.cos(2 * alpha), np.sin(2 * alpha)
qm = esc_q * c2a + esc_u * s2a
um = -esc_q * s2a + esc_u * c2a

for lo, hi in ((0.0, 0.1), (0.1, 0.2), (0.3, 0.4), (0.6, 0.7), (0.9, 1.0)):
    m = (esc_mu >= lo) & (esc_mu < hi) & ok
    print(f"mu {lo:.1f}-{hi:.1f}: n={m.sum():6d} "
          f"Q/I={qm[m].mean():+.4f} U/I={um[m].mean():+.4f}")
print("expect Q/I -> -0.117 (polarization parallel to surface) at mu->0,"
      " 0 at mu->1")
