"""End-to-end demo: denoise a synthetic noisy EELS cube and a 4D-STEM
datacube, single-device and sharded, and report convergence.

Run:  python examples/denoise_synthetic.py [--sharded]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cytvdn_tpu as tv  # noqa: E402


def synthetic_eels(shape=(64, 64, 512), noise=0.2, seed=0):
    """Piecewise-constant spectra + Gaussian noise — the implied validation
    dataset of the reference (SURVEY.md §4)."""
    rng = np.random.default_rng(seed)
    clean = np.zeros(shape, np.float32)
    edge = shape[2] // 3
    clean[:, :, edge:] = 1.0
    clean[: shape[0] // 2, :, 2 * edge:] = 2.0
    noisy = clean + rng.standard_normal(shape).astype(np.float32) * noise
    return clean, noisy


def main():
    clean, noisy = synthetic_eels()
    mu = np.full(3, 2.0, np.float32)

    t0 = time.time()
    recon, b_norm, delta, mse = tv.denoise3D(
        noisy, mu, iterations=100, FISTA=True,
        stopping_relative_change=0.001, reference_data=clean, quiet=True,
    )
    ran = int(np.count_nonzero(delta))
    print(f"3D FISTA: {ran} iterations in {time.time() - t0:.2f}s; "
          f"SSE {mse[0]:.1f} -> {mse[ran]:.1f} "
          f"({mse[ran] / mse[0] * 100:.1f}% of noisy)")

    if "--sharded" in sys.argv:
        from cytvdn_tpu.parallel import denoise_sharded

        out = denoise_sharded(noisy, mu, iterations=50, FISTA=True,
                              shard="auto")
        print(f"sharded: ran {out['iterations_run']} iterations, "
              f"final delta {out['delta'][out['iterations_run'] - 1]:.5f}")

    # 4D-STEM demo with the stem4d preset
    rng = np.random.default_rng(1)
    cube4 = (rng.standard_normal((32, 32, 24, 24)) * 0.3 + 1.0).astype(
        np.float32)
    from cytvdn_tpu.presets import denoise_preset

    t0 = time.time()
    r4, bn4, dl4 = denoise_preset(cube4, np.full(4, 1.0, np.float32),
                                  "stem4d", quiet=True)
    print(f"4D stem4d preset: 10 FISTA iterations in {time.time() - t0:.2f}s;"
          f" final delta {dl4[-1]:.5f}")


if __name__ == "__main__":
    main()
