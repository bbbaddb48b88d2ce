"""Golden numpy model of the reference kernels' exact mathematical semantics
(SURVEY.md §8.1). Written from the spec, vectorized; float64 runs agree with
any summation order to ~1e-12, so these serve as the correctness oracle for
every backend (jax ops, Pallas kernels, sharded solver).

Semantics sources:
- accumulator update: reference cyTVDN/anisotropic.pyx:17-84 (BC handling
  lines 60-82)
- FISTA variant: reference cyTVDN/anisotropic.pyx:89-164
- half-isotropic: reference cyTVDN/halfisotropic.pyx:17-188 (JZ only)
- reconstruction update: reference cyTVDN/utils.pyx:54-125 (JZ≡periodic
  wraparound by the zero-slab invariant; mirror implemented *correctly*
  here — neighbor min(i+1, N-1) — unlike the reference's buggy max clamp)
- SSE: reference cyTVDN/utils.pyx:14-49
"""

import numpy as np


def _backward_shift(a, ax, bc):
    """s_i = a_{i-1}; s_0 per BC (0 periodic / 1 mirror / 2 Jia-Zhao)."""
    s = np.roll(a, 1, axis=ax)
    sel = [slice(None)] * a.ndim
    sel[ax] = 0
    sel = tuple(sel)
    if bc == 1:
        s[sel] = np.take(a, 1, axis=ax)
    elif bc == 2:
        s[sel] = np.take(a, 0, axis=ax)
    return s


def _forward_shift(b, ax, bc):
    """s_i = b_{i+1}; s_{N-1} per BC (periodic/JZ wrap; mirror: own last)."""
    s = np.roll(b, -1, axis=ax)
    if bc == 1:
        sel = [slice(None)] * b.ndim
        sel[ax] = -1
        s[tuple(sel)] = np.take(b, -1, axis=ax)
    return s


def accumulator_update(a, b, ax, clip, bc=2):
    b_new = np.clip(a - _backward_shift(a, ax, bc) + b, -clip, clip)
    return b_new, np.abs(b_new).sum()


def accumulator_update_fista(a, b, d, tk_ratio, ax, clip, bc=2):
    d_new = np.clip(a - _backward_shift(a, ax, bc) + b, -clip, clip)
    b_new = d_new + tk_ratio * (d_new - d)
    return b_new, d_new, np.abs(b_new).sum()


def _iso_project(d1, d2, clip):
    mag = np.hypot(d1, d2)
    scale = np.where(mag > clip, clip / np.where(mag > 0, mag, 1.0), 1.0)
    return d1 * scale, d2 * scale


def iso_accumulator_update(a, b1, b2, ax1, ax2, clip):
    d1 = a - _backward_shift(a, ax1, 2) + b1
    d2 = a - _backward_shift(a, ax2, 2) + b2
    b1n, b2n = _iso_project(d1, d2, clip)
    return b1n, b2n, np.abs(b1n).sum() + np.abs(b2n).sum()


def iso_accumulator_update_fista(a, b1, b2, d1, d2, tk_ratio, ax1, ax2, clip):
    e1 = a - _backward_shift(a, ax1, 2) + b1
    e2 = a - _backward_shift(a, ax2, 2) + b2
    d1n, d2n = _iso_project(e1, e2, clip)
    b1n = d1n + tk_ratio * (d1n - d1)
    b2n = d2n + tk_ratio * (d2n - d2)
    return b1n, b2n, d1n, d2n, np.abs(b1n).sum() + np.abs(b2n).sum()


def datacube_update(orig, recon, bs, lam_mu, bc=2):
    div = np.zeros_like(orig)
    for k, b in enumerate(bs):
        div = div + lam_mu[k] * (b - _forward_shift(b, k, bc))
    recon_new = orig - div
    delta = np.abs(recon_new - recon).sum() / np.abs(recon).sum()
    return recon_new, delta


def sum_square_error(a, b):
    return ((a - b) ** 2).sum()


def solve(
    orig,
    lambda_inv,
    lam_mu,
    n_fista,
    n_unacc,
    bc=2,
    stopping=None,
    isotropic_R=False,
    isotropic_Q=False,
    reference_data=None,
):
    """Golden full solver loop replicating the reference driver's control
    flow (reference cyTVDN/cyTVDN.py:147-242): FISTA phase then (always, if
    scheduled) unaccelerated phase sharing accumulators; traces zero-padded
    after early stop."""
    ndim = orig.ndim
    n_total = n_fista + n_unacc
    accs = [np.zeros_like(orig) for _ in range(ndim)]
    ds = [np.zeros_like(orig) for _ in range(ndim)]
    recon = orig.copy()
    b_norm = np.zeros(n_total, dtype=orig.dtype)
    delta_tr = np.zeros(n_total, dtype=orig.dtype)
    mse = None
    if reference_data is not None:
        mse = np.zeros(n_total + 1, dtype=orig.dtype)
        mse[0] = sum_square_error(orig, reference_data)

    def axis_pass(i, fista, tk_ratio):
        norm_tot = 0.0
        if ndim == 4 and isotropic_R:
            if fista:
                accs[0], accs[1], ds[0], ds[1], n = iso_accumulator_update_fista(
                    recon, accs[0], accs[1], ds[0], ds[1], tk_ratio, 0, 1,
                    lambda_inv[0])
            else:
                accs[0], accs[1], n = iso_accumulator_update(
                    recon, accs[0], accs[1], 0, 1, lambda_inv[0])
            norm_tot += n
            axes = []
        else:
            axes = [0, 1] if ndim == 4 else [0, 1, 2]
        if ndim == 4 and isotropic_Q:
            if fista:
                accs[2], accs[3], ds[2], ds[3], n = iso_accumulator_update_fista(
                    recon, accs[2], accs[3], ds[2], ds[3], tk_ratio, 2, 3,
                    lambda_inv[2])
            else:
                accs[2], accs[3], n = iso_accumulator_update(
                    recon, accs[2], accs[3], 2, 3, lambda_inv[2])
            norm_tot += n
        elif ndim == 4:
            axes += [2, 3]
        for ax in axes:
            if fista:
                accs[ax], ds[ax], n = accumulator_update_fista(
                    recon, accs[ax], ds[ax], tk_ratio, ax, lambda_inv[ax], bc)
            else:
                accs[ax], n = accumulator_update(
                    recon, accs[ax], ax, lambda_inv[ax], bc)
            norm_tot += n
        return norm_tot

    tk = 1.0
    for i in range(n_fista):
        tk_new = (1 + np.sqrt(1 + 4 * tk**2)) / 2
        tk_ratio = orig.dtype.type((tk - 1.0) / tk_new)
        tk = tk_new
        b_norm[i] = axis_pass(i, True, tk_ratio)
        recon, delta_tr[i] = datacube_update(orig, recon, accs, lam_mu, bc)
        if reference_data is not None:
            mse[i + 1] = sum_square_error(reference_data, recon)
        if stopping is not None and delta_tr[i] < stopping:
            break

    for j in range(n_unacc):
        i = j + n_fista
        b_norm[i] = axis_pass(i, False, None)
        recon, delta_tr[i] = datacube_update(orig, recon, accs, lam_mu, bc)
        if reference_data is not None:
            mse[i + 1] = sum_square_error(reference_data, recon)
        if stopping is not None and delta_tr[i] < stopping:
            break

    if reference_data is not None:
        return recon, b_norm, delta_tr, mse
    return recon, b_norm, delta_tr
