"""Manual fused-kernel validation script (also usable on the real TPU where
the pytest suite forces CPU). Usage:

    python tests/manual_fused_check.py cpu     # interpret mode
    python tests/manual_fused_check.py tpu     # compiled on the TPU
"""

import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root
sys.path.insert(0, _HERE)                   # tests/ (for golden)

ON = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax  # noqa: E402

if ON == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "tests")
import golden  # noqa: E402

from cytvdn_tpu.kernels.fused import fused_iteration  # noqa: E402

INTERPRET = ON == "cpu"
rng = np.random.default_rng(1)


def setup(shape):
    ndim = len(shape)
    a = (rng.standard_normal(shape) * 0.5 + 2).astype(np.float32)
    recon = (rng.standard_normal(shape) * 0.5 + 2).astype(np.float32)
    accs, ds = [], []
    for k in range(ndim):
        arr = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        darr = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        sl = [slice(None)] * ndim
        sl[k] = 0
        arr[tuple(sl)] = 0.0  # JZ zero-slab invariant
        darr[tuple(sl)] = 0.0
        accs.append(arr)
        ds.append(darr)
    return a, recon, accs, ds


def check(shape, fista):
    ndim = len(shape)
    a, recon, accs, ds = setup(shape)
    lam_inv = np.full(ndim, 8.0, np.float32)
    lam_mu = np.full(ndim, 1 / 32, np.float32)
    rho = np.float32(0.6)
    g_accs, gbn = [], 0.0
    for k in range(ndim):
        if fista:
            b, d, n = golden.accumulator_update_fista(
                recon.astype(np.float64), accs[k].astype(np.float64),
                ds[k].astype(np.float64), float(rho), k, float(lam_inv[k]), 2)
        else:
            b, n = golden.accumulator_update(
                recon.astype(np.float64), accs[k].astype(np.float64), k,
                float(lam_inv[k]), 2)
        g_accs.append(b)
        gbn += n
    g_recon, g_delta = golden.datacube_update(
        a.astype(np.float64), recon.astype(np.float64), g_accs,
        lam_mu.astype(np.float64), 2)
    t0 = time.time()
    out = fused_iteration(
        jnp.asarray(a), jnp.asarray(recon),
        tuple(jnp.asarray(x) for x in accs),
        tuple(jnp.asarray(x) for x in ds) if fista else None,
        rho, jnp.asarray(lam_inv), jnp.asarray(lam_mu),
        fista=fista, interpret=INTERPRET)
    recon_new = np.asarray(out[0])
    dt = time.time() - t0
    err_r = np.max(np.abs(recon_new - g_recon))
    err_b = max(np.max(np.abs(np.asarray(out[1][k]) - g_accs[k]))
                for k in range(ndim))
    err_n = abs(float(out[3]) - gbn) / gbn
    err_dl = abs(float(out[4]) / float(out[5]) - g_delta) / g_delta
    status = "OK " if max(err_r, err_b) < 1e-5 and max(err_n, err_dl) < 1e-4 \
        else "FAIL"
    print(f"{status} {shape} fista={fista}: recon {err_r:.2e} "
          f"accs {err_b:.2e} bnorm {err_n:.2e} delta {err_dl:.2e} "
          f"[{dt:.1f}s]", flush=True)
    return status == "OK "


if __name__ == "__main__":
    np.asarray(jnp.ones((8,)))  # tunnel warmup on TPU
    ok = True
    ok &= check((6, 8, 16), True)       # 3D "single" layout
    ok &= check((6, 8, 16), False)
    ok &= check((6, 256, 512), True)    # 3D "flat" layout (E folded to 128)
    ok &= check((5, 6, 8, 16), True)
    ok &= check((5, 6, 8, 16), False)
    if ON == "tpu":
        ok &= check((64, 64, 512), True)
        ok &= check((32, 32, 64, 64), True)
        ok &= check((32, 32, 64, 64), False)
    sys.exit(0 if ok else 1)
