"""Scoping experiment: bf16 storage for the FISTA shadow duals (``d``).

STATUS round-2 known-limit 7: the pair kernel is traffic-bound at the
chip's sustained DMA rate; the only remaining single-chip lever is lossy
compression of state. The cheapest candidate is storing the shadow duals
in bfloat16 — per 4D FISTA pair-iteration traffic of ~44 B/voxel, the
``d`` arrays contribute 2n x 4 B read+write per pair = 16 B/voxel-pair,
so bf16 ``d`` saves ~8 B/voxel-pair ≈ 18%% of traffic (≈1.2x potential).

This experiment SIMULATES the kernel change exactly: compute stays f32,
``d`` is rounded to bf16 at every second iteration boundary (the pair
kernel writes ``d`` to HBM once per pair; iteration-1 ``d`` lives only
in VMEM carries). The exact run and the rounded run are compared on
recon rel-L2 per iteration against the 1e-5 float32 parity budget
(BASELINE.json north-star tolerance).

Writes EXPERIMENT_BF16_DUALS.json at the repo root with the drift curve
and a verdict. Run on any backend (CPU ok — pure XLA ops).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cytvdn_tpu import ops
    from cytvdn_tpu.config import SolverOptions
    from cytvdn_tpu.solver.engine import fista_tk_ratios

    shape = (32, 32, 16, 16)
    n_iter = 150
    rng = np.random.default_rng(0)
    orig = jnp.asarray(rng.standard_normal(shape) * 0.3 + 1.0,
                       dtype=jnp.float32)
    ndim = len(shape)
    mu = np.full(ndim, 1.0, np.float32)
    lam = mu / 32.0
    li = jnp.asarray(1.0 / lam)
    lm = jnp.asarray(lam / mu)
    opts = SolverOptions(ndim=ndim, iterations_fista=n_iter,
                         iterations_unacc=0)
    tks = fista_tk_ratios(n_iter).astype(np.float32)

    def step(recon, accs, ds, tk):
        accs_n, ds_n = [], []
        for ax in range(ndim):
            b, d, _ = ops.accumulator_update_fista(
                recon, accs[ax], ds[ax], tk, ax, li[ax], 2, None)
            accs_n.append(b)
            ds_n.append(d)
        recon_n, _, _ = ops.datacube_update(orig, recon, accs_n, lm, 2,
                                            [None] * ndim)
        return recon_n, accs_n, ds_n

    step_j = jax.jit(step)

    def run(round_d_every=None):
        recon = orig
        accs = [jnp.zeros(shape, jnp.float32) for _ in range(ndim)]
        ds = [jnp.zeros(shape, jnp.float32) for _ in range(ndim)]
        recons = []
        for i in range(n_iter):
            recon, accs, ds = step_j(recon, accs, ds,
                                     jnp.float32(tks[i]))
            if round_d_every and (i + 1) % round_d_every == 0:
                # HBM writeback precision: bf16 round-trip, compute f32
                ds = [d.astype(jnp.bfloat16).astype(jnp.float32)
                      for d in ds]
            recons.append(recon)
        return recons

    exact = run(None)
    lossy = run(2)   # the pair kernel writes d to HBM once per pair

    drift = []
    for i in (9, 24, 49, 99, 149):
        a, b = np.asarray(exact[i], np.float64), np.asarray(
            lossy[i], np.float64)
        drift.append({
            "iteration": i + 1,
            "recon_rel_l2_vs_exact": float(
                np.linalg.norm(a - b) / np.linalg.norm(a)),
        })
    final = drift[-1]["recon_rel_l2_vs_exact"]

    # traffic model: 4D FISTA pair traffic per voxel-iteration (pair
    # backend, utils/perf.py) with d reads+writes halved
    n = ndim
    trav_pair = (4 * n + 3) / 2 + 1
    d_trav = (2 * n) / 2          # d read+write per iteration (pair: /2)
    saving = (d_trav * 0.5) / trav_pair

    budget = 1e-5
    out = {
        "experiment": "bf16 shadow duals (d) — simulated at the exact "
                      "HBM-writeback boundary of the K=2 pair kernel "
                      "(round every 2nd iteration; compute f32)",
        "shape": list(shape),
        "iterations": n_iter,
        "drift": drift,
        "final_recon_rel_l2_vs_exact": final,
        "parity_budget_rel_l2": budget,
        "traffic_saving_fraction": round(saving, 4),
        "projected_speedup": round(1.0 / (1.0 - saving), 3),
        "verdict": (
            "WITHIN budget — lever viable" if final < budget else
            "EXCEEDS the 1e-5 parity budget — bf16 shadow duals cannot "
            "ship as a default; closes STATUS known-limit 7's last "
            "lossless-looking lever with data (could be offered as an "
            "opt-in lossy mode only)"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "EXPERIMENT_BF16_DUALS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
