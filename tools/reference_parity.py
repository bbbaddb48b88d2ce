"""Build the actual reference (cyTVDN) Cython kernels and verify numerical
parity against this framework, plus measure the real reference throughput.

The reference's checked-in Cython-0.29.24-generated C cannot build on this
image's main Python (3.12 removed APIs it uses), but the system python3.11
can host it with three mechanical build shims (none of which touch the
kernel math): PyLong internals off, fast-pycall paths off, and the
traceback-only PyCode_New/f_lineno uses stubbed. The kernels' compute
loops compile untouched.

Protocol:
1. (main python) generate shared random inputs -> npz
2. (python3.11) run the reference kernels + a reference-faithful driver
   loop on them -> npz, and time single-thread 4D FISTA iterations
3. (main python) run this framework on the same inputs and compare

Usage: python tools/reference_parity.py [--skip-build]
Writes REFERENCE_PARITY.json at the repo root.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/cyTVDN"
PY311 = "/usr/bin/python3.11"
PY311_INC = "/mnt/sandboxing/model_tools_env/v1/python/install/include/python3.11"
NP311_INC = "/usr/lib/python3/dist-packages/numpy/core/include"

FIX_HEADER = r"""
#include "Python.h"
static PyCodeObject* __fix_pycode_new(int a, int k, int l, int s, int f,
    PyObject *code, PyObject *c, PyObject *n, PyObject *v, PyObject *fv,
    PyObject *cell, PyObject *fn, PyObject *name, int fline,
    PyObject *lnos) {
  const char *fns = PyUnicode_Check(fn) ? PyUnicode_AsUTF8(fn) : "src";
  const char *nms = PyUnicode_Check(name) ? PyUnicode_AsUTF8(name) : "fn";
  (void)a;(void)k;(void)l;(void)s;(void)f;(void)code;(void)c;(void)n;
  (void)v;(void)fv;(void)cell;(void)lnos;
  return PyCode_NewEmpty(fns, nms, fline);
}
#define PyCode_New(a,k,l,s,f,code,c,n,v,fv,cell,fn,name,fline,lnos) \
  __fix_pycode_new(a,k,l,s,f,code,c,n,v,fv,cell,fn,name,fline,lnos)
"""

RUNNER = r"""
import sys, time
import numpy as np
sys.path.insert(0, sys.argv[1])
import anisotropic, utils, halfisotropic

z = np.load(sys.argv[2])
out = {}

# ---- kernel-level parity (BC 0 and 2; the reference mirror branch of the
# recon update is known-buggy, SURVEY.md §2.3) ----
for bc in (0, 1, 2):
    a = z["a3"].copy(); b = z["b3"].copy()
    for ax in range(3):
        bb = b.copy()
        n = anisotropic.accumulator_update_3D(a, bb, ax, 0.3, BC_mode=bc)
        out[f"acc3_bc{bc}_ax{ax}"] = bb
        out[f"acc3n_bc{bc}_ax{ax}"] = np.float64(n)
    a4 = z["a4"].copy()
    for ax in range(4):
        bb = z["b4"].copy()
        n = anisotropic.accumulator_update_4D(a4, bb, ax, 0.3, BC_mode=bc)
        out[f"acc4_bc{bc}_ax{ax}"] = bb

# FISTA variant
bb = z["b4"].copy(); dd = z["d4"].copy()
n = anisotropic.accumulator_update_4D_FISTA(z["a4"].copy(), bb, dd,
                                            0.7, 1, 0.3, BC_mode=2)
out["acc4f_b"] = bb; out["acc4f_d"] = dd; out["acc4f_n"] = np.float64(n)

# iso
b1 = z["b4"].copy(); b2 = z["d4"].copy()
n = halfisotropic.iso_accumulator_update_4D(z["a4"].copy(), b1, b2, 2, 3, 0.2)
out["iso_b1"] = b1; out["iso_b2"] = b2; out["iso_n"] = np.float64(n)

# recon updates (periodic + JZ + the known-buggy mirror branch, recorded
# to confirm the SURVEY §8.2 defect registry against the real binary)
for bc in (0, 1, 2):
    rec = z["rec3"].copy()
    d = utils.datacube_update_3D(z["a3"].copy(), rec, z["b3"].copy(),
                                 z["c3"].copy(), z["e3"].copy(),
                                 z["w3"].copy(), BC_mode=bc)
    out[f"rec3_bc{bc}"] = rec; out[f"rec3d_bc{bc}"] = np.float64(d)

rec4 = z["rec4"].copy()
d4m = utils.datacube_update_4D(z["a4"].copy(), rec4, z["b4"].copy(),
                               z["d4"].copy(), z["rb3"].copy(),
                               z["rb4"].copy(), z["w4"].copy(), BC_mode=1)
out["rec4_bc1"] = rec4; out["rec4d_bc1"] = np.float64(d4m)

out["sse"] = np.float64(utils.sum_square_error_3D(z["a3"].copy(),
                                                  z["rec3"].copy()))

# ---- full driver loop, reference-faithful (cyTVDN.py:147-194) ----
def run_loop(cube, n_iter, fista):
    accs = [np.zeros_like(cube) for _ in range(4)]
    ds = [np.zeros_like(cube) for _ in range(4)]
    recon = cube.copy()
    lam_inv = np.float32(32.0); w = np.full(4, 1/32, np.float32)
    bn = np.zeros(n_iter); dl = np.zeros(n_iter)
    tk = 1.0
    for i in range(n_iter):
        tk_new = (1 + np.sqrt(1 + 4 * tk ** 2)) / 2
        tk_ratio = (tk - 1.0) / tk_new
        tk = tk_new
        s = 0.0
        for ax in range(4):
            if fista:
                s += anisotropic.accumulator_update_4D_FISTA(
                    recon, accs[ax], ds[ax], tk_ratio, ax, lam_inv, BC_mode=2)
            else:
                s += anisotropic.accumulator_update_4D(
                    recon, accs[ax], ax, lam_inv, BC_mode=2)
        bn[i] = s
        dl[i] = utils.datacube_update_4D(cube, recon, *accs, w, BC_mode=2)
    return recon, bn, dl

recon, bn, dl = run_loop(z["cube"].copy(), 8, True)
out["loop_recon"] = recon; out["loop_bnorm"] = bn; out["loop_delta"] = dl

# 3D unaccelerated loop (the reference denoise3D structure,
# cyTVDN.py:401-418), 50 iterations
def run_loop_3d(cube, n_iter):
    accs = [np.zeros_like(cube) for _ in range(3)]
    recon = cube.copy()
    lam_inv = np.float32(16.0); w = np.full(3, 1/16, np.float32)
    bn = np.zeros(n_iter); dl = np.zeros(n_iter)
    for i in range(n_iter):
        s = 0.0
        for ax in range(3):
            s += anisotropic.accumulator_update_3D(
                recon, accs[ax], ax, lam_inv, BC_mode=2)
        bn[i] = s
        dl[i] = utils.datacube_update_3D(cube, recon, *accs, w, BC_mode=2)
    return recon, bn, dl

r3, bn3, dl3 = run_loop_3d(z["cube3"].copy(), 50)
out["loop3_recon"] = r3; out["loop3_bnorm"] = bn3; out["loop3_delta"] = dl3

# hybrid schedule: FISTA phase then unaccelerated sharing accumulators
# (cyTVDN.py:100-108, 195-242)
def run_hybrid(cube, n_fista, n_unacc):
    accs = [np.zeros_like(cube) for _ in range(4)]
    ds = [np.zeros_like(cube) for _ in range(4)]
    recon = cube.copy()
    lam_inv = np.float32(32.0); w = np.full(4, 1/32, np.float32)
    n = n_fista + n_unacc
    bn = np.zeros(n); dl = np.zeros(n)
    tk = 1.0
    for i in range(n_fista):
        tk_new = (1 + np.sqrt(1 + 4 * tk ** 2)) / 2
        tk_ratio = (tk - 1.0) / tk_new
        tk = tk_new
        s = 0.0
        for ax in range(4):
            s += anisotropic.accumulator_update_4D_FISTA(
                recon, accs[ax], ds[ax], tk_ratio, ax, lam_inv, BC_mode=2)
        bn[i] = s
        dl[i] = utils.datacube_update_4D(cube, recon, *accs, w, BC_mode=2)
    for j in range(n_unacc):
        i = j + n_fista
        s = 0.0
        for ax in range(4):
            s += anisotropic.accumulator_update_4D(
                recon, accs[ax], ax, lam_inv, BC_mode=2)
        bn[i] = s
        dl[i] = utils.datacube_update_4D(cube, recon, *accs, w, BC_mode=2)
    return recon, bn, dl

rh, bnh, dlh = run_hybrid(z["cube"].copy(), 4, 4)
out["hyb_recon"] = rh; out["hyb_bnorm"] = bnh; out["hyb_delta"] = dlh

# ---- single-thread timing, the real reference baseline ----
# best-of-3 timed runs: the baseline must be the FASTEST the reference
# does (a contended/noisy sample would flatter vs_baseline)
big = np.ascontiguousarray(z["bench"].astype(np.float32))
r2, _, _ = run_loop(big, 1, True)  # warm
ITERS = 3
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    run_loop(big, ITERS, True)
    best = min(best, time.perf_counter() - t0)
out["ref_vox_per_sec_1thread"] = np.float64(big.size * ITERS / best)

np.savez(sys.argv[3], **out)
print("reference run complete", flush=True)
"""


def build(tmp: str) -> bool:
    for f in ("anisotropic", "utils", "halfisotropic"):
        shutil.copy(os.path.join(REF, f + ".c"), tmp)
    with open(os.path.join(tmp, "fix311.h"), "w") as fh:
        fh.write(FIX_HEADER)
    # stub the one traceback-cosmetic frame write 3.11 forbids
    for f in ("anisotropic", "utils", "halfisotropic"):
        p = os.path.join(tmp, f + ".c")
        src = open(p).read()
        src = src.replace(
            "#define __Pyx_PyFrame_SetLineNumber(frame, lineno)  "
            "(frame)->f_lineno = (lineno)",
            "#define __Pyx_PyFrame_SetLineNumber(frame, lineno) "
            "((void)(frame), (void)(lineno))",
        )
        open(p, "w").write(src)
        flags = ("-DCYTHON_USE_PYLONG_INTERNALS=0 -DCYTHON_FAST_PYCALL=0 "
                 "-DCYTHON_FAST_THREAD_STATE=0 -DCYTHON_USE_EXC_INFO_STACK=0 "
                 "-DCYTHON_PROFILE=0 -DCYTHON_TRACE=0").split()
        cmd = ["gcc", "-O3", "-fopenmp", "-shared", "-fPIC", *flags,
               "-include", os.path.join(tmp, "fix311.h"),
               f"-I{PY311_INC}", f"-I{NP311_INC}", p,
               "-o", os.path.join(tmp, f + ".cpython-311-x86_64-linux-gnu.so")]
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            print(f"build of {f} failed:\n{r.stderr[-2000:]}")
            return False
    return True


def main():
    skip_build = "--skip-build" in sys.argv[1:]
    if not (os.path.exists(PY311) and os.path.exists(PY311_INC)
            and os.path.isdir(REF)):
        print("python3.11 toolchain or reference checkout unavailable; "
              "skipping real-reference parity (proxy baseline stands)")
        return 0
    tmp = os.path.join(tempfile.gettempdir(), "cytvdn_refparity")
    os.makedirs(tmp, exist_ok=True)
    built = all(
        os.path.exists(os.path.join(
            tmp, f + ".cpython-311-x86_64-linux-gnu.so"))
        for f in ("anisotropic", "utils", "halfisotropic")
    )
    if not (skip_build and built):
        if not build(tmp):
            return 1

    rng = np.random.default_rng(123)
    inputs = {
        "a3": rng.standard_normal((6, 7, 8)).astype(np.float32),
        "b3": (rng.standard_normal((6, 7, 8)) * 0.1).astype(np.float32),
        "c3": (rng.standard_normal((6, 7, 8)) * 0.1).astype(np.float32),
        "e3": (rng.standard_normal((6, 7, 8)) * 0.1).astype(np.float32),
        "rec3": rng.standard_normal((6, 7, 8)).astype(np.float32),
        "w3": np.full(3, 1 / 16, np.float32),
        "a4": rng.standard_normal((4, 5, 6, 7)).astype(np.float32),
        "b4": (rng.standard_normal((4, 5, 6, 7)) * 0.1).astype(np.float32),
        "d4": (rng.standard_normal((4, 5, 6, 7)) * 0.1).astype(np.float32),
        "rb3": (rng.standard_normal((4, 5, 6, 7)) * 0.1).astype(np.float32),
        "rb4": (rng.standard_normal((4, 5, 6, 7)) * 0.1).astype(np.float32),
        "rec4": rng.standard_normal((4, 5, 6, 7)).astype(np.float32),
        "w4": np.full(4, 1 / 32, np.float32),
        "cube": (rng.standard_normal((8, 8, 12, 12)) * 0.4 + 1.5
                 ).astype(np.float32),
        "cube3": (rng.standard_normal((16, 16, 64)) * 0.4 + 1.5
                  ).astype(np.float32),
        "bench": (rng.standard_normal((48, 48, 48, 48)) * 0.4 + 1.5
                  ).astype(np.float32),
    }
    in_npz = os.path.join(tmp, "inputs.npz")
    out_npz = os.path.join(tmp, "outputs.npz")
    np.savez(in_npz, **inputs)
    with open(os.path.join(tmp, "runner.py"), "w") as f:
        f.write(RUNNER)
    env = dict(os.environ, OMP_NUM_THREADS="1", PYTHONPATH="")
    r = subprocess.run([PY311, os.path.join(tmp, "runner.py"), tmp, in_npz,
                        out_npz], capture_output=True, text=True, env=env)
    if r.returncode != 0:
        print(f"reference run failed:\n{r.stderr[-3000:]}")
        return 1
    ref = np.load(out_npz)

    # ---- compare against this framework ----
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import golden

    report = {"kernel_parity": {}, "defect_confirmations": {}}

    def rel(a, b):
        d = np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        n = np.linalg.norm(np.asarray(b, np.float64))
        return float(d / n) if n else float(d)

    worst = 0.0
    for bc in (0, 1, 2):
        for ax in range(3):
            ours, _ = golden.accumulator_update(
                inputs["a3"], inputs["b3"], ax, np.float32(0.3), bc)
            worst = max(worst, rel(ours, ref[f"acc3_bc{bc}_ax{ax}"]))
        for ax in range(4):
            ours, _ = golden.accumulator_update(
                inputs["a4"], inputs["b4"], ax, np.float32(0.3), bc)
            worst = max(worst, rel(ours, ref[f"acc4_bc{bc}_ax{ax}"]))
    report["kernel_parity"]["accumulator_all_bcs_rel_l2_max"] = worst

    ob, od, _ = golden.accumulator_update_fista(
        inputs["a4"], inputs["b4"], inputs["d4"], np.float32(0.7), 1,
        np.float32(0.3), 2)
    report["kernel_parity"]["fista_b_rel_l2"] = rel(ob, ref["acc4f_b"])
    report["kernel_parity"]["fista_d_rel_l2"] = rel(od, ref["acc4f_d"])

    o1, o2, _ = golden.iso_accumulator_update(
        inputs["a4"], inputs["b4"], inputs["d4"], 2, 3, np.float32(0.2))
    report["kernel_parity"]["iso_rel_l2"] = max(rel(o1, ref["iso_b1"]),
                                                rel(o2, ref["iso_b2"]))

    for bc in (0, 2):
        ours, _ = golden.datacube_update(
            inputs["a3"], inputs["rec3"],
            [inputs["b3"], inputs["c3"], inputs["e3"]], inputs["w3"], bc)
        report["kernel_parity"][f"recon_bc{bc}_rel_l2"] = rel(
            ours, ref[f"rec3_bc{bc}"])

    # ---- SURVEY §8.2 defect confirmations against the real binary ----
    # The reference's mirror (BC 1) reconstruction updates are buggy; this
    # package implements mirror correctly and documents the deviation
    # (config.py::BCMode). Confirm each defect by (a) bit-matching a numpy
    # emulation of the bug to the binary on the in-bounds region, and
    # (b) measuring the binary's deviation from the *correct* mirror.
    def _mirror4_defect_emulation(orig, bs, w):
        # reference utils.pyx:117-120: neighbor index = max(i+1, N-1) —
        # the clamp goes the wrong way, so every in-bounds read hits the
        # LAST element along the axis; i = N-1 reads out of bounds
        # (boundscheck off), so the last hyperslab per axis is excluded
        # from the comparison region.
        acc = np.zeros_like(orig)
        for k, b in enumerate(bs):
            last = np.take(b, [b.shape[k] - 1], axis=k)
            acc = acc + np.float32(w[k]) * (b - last)
        return orig - acc

    em4 = _mirror4_defect_emulation(
        inputs["a4"],
        [inputs["b4"], inputs["d4"], inputs["rb3"], inputs["rb4"]],
        inputs["w4"])
    interior4 = tuple(slice(0, n - 1) for n in inputs["a4"].shape)
    got4 = ref["rec4_bc1"]
    correct4, _ = golden.datacube_update(
        inputs["a4"], inputs["rec4"],
        [inputs["b4"], inputs["d4"], inputs["rb3"], inputs["rb4"]],
        inputs["w4"], 1)
    report["defect_confirmations"]["mirror_4d_recon_max_clamp"] = {
        "reference_loc": "utils.pyx:117-120",
        "binary_matches_defect_emulation_interior_max_abs": float(
            np.max(np.abs(got4[interior4] - em4[interior4]))),
        # interior-only: trailing hyperslabs hold OOB reads (boundscheck
        # off) and are not deterministic run-to-run
        "binary_vs_correct_mirror_interior_rel_l2": rel(
            got4[interior4], correct4[interior4]),
        "confirmed": bool(
            np.max(np.abs(got4[interior4] - em4[interior4])) == 0.0
            and rel(got4[interior4], correct4[interior4]) > 1e-3),
    }

    def _mirror3_defect_emulation(orig, bs, w):
        # Two stacked defects. (1) utils.pyx:192-194: ALL three axes
        # index with max(i+1, MBCend[ax]) where i is the AXIS-0 index
        # (copy-paste). (2) In the SHIPPED generated C (utils.c:7754,
        # verified by bit-matching the built binary), `MBCend = shape`
        # compiles to `memcpy(MBCend, shape, sizeof(int)*3)` with shape
        # declared Py_ssize_t[3] — the 12-byte copy of a 24-byte array
        # truncates to [N0, 0, N1], so after the -1 loop MBCend is
        # [N0-1, -1, N1-1]: axis-1's neighbor is an unclamped i+1 and
        # axis-2's clamp uses N1-1. i = N0-1 reads out of bounds on
        # axis 0; rows i <= N0-2 are deterministic and emulated here.
        N0, N1, _ = orig.shape
        out = np.empty_like(orig)
        for i in range(N0 - 1):
            n0 = max(i + 1, N0 - 1)
            n1 = max(i + 1, -1)
            n2 = max(i + 1, N1 - 1)
            out[i] = orig[i] - (
                np.float32(w[0]) * (bs[0][i] - bs[0][n0])
                + np.float32(w[1]) * (bs[1][i] - bs[1][i, n1:n1 + 1, :])
                + np.float32(w[2]) * (bs[2][i] - bs[2][i, :, n2:n2 + 1])
            )
        out[N0 - 1] = orig[N0 - 1]  # OOB row, excluded from comparison
        return out

    em3 = _mirror3_defect_emulation(
        inputs["a3"],
        [inputs["b3"], inputs["c3"], inputs["e3"]], inputs["w3"])
    got3 = ref["rec3_bc1"]
    n0 = inputs["a3"].shape[0]
    correct3, _ = golden.datacube_update(
        inputs["a3"], inputs["rec3"],
        [inputs["b3"], inputs["c3"], inputs["e3"]], inputs["w3"], 1)
    report["defect_confirmations"]["mirror_3d_recon_axis_copy_paste"] = {
        "reference_loc": "utils.pyx:192-194 + utils.c:7754 (int vs "
                         "Py_ssize_t memcpy truncation: MBCend = "
                         "[N0-1, -1, N1-1] in the shipped binary)",
        "binary_matches_defect_emulation_interior_max_abs": float(
            np.max(np.abs(got3[: n0 - 1] - em3[: n0 - 1]))),
        # interior-only: the binary's last row holds OOB heap reads and
        # is not deterministic run-to-run
        "binary_vs_correct_mirror_interior_rel_l2": rel(
            got3[: n0 - 1], correct3[: n0 - 1]),
        "confirmed": bool(
            np.max(np.abs(got3[: n0 - 1] - em3[: n0 - 1])) == 0.0
            and rel(got3[: n0 - 1], correct3[: n0 - 1]) > 1e-3),
    }

    # utils.pyx:197: the 3D mirror branch accumulates
    # recon_norm += fabs(recon_norm) — a self-referencing sum that stays
    # identically zero, so the returned delta is delta/0 = inf.
    d3m = float(ref["rec3d_bc1"])
    report["defect_confirmations"]["mirror_3d_delta_norm_feedback"] = {
        "reference_loc": "utils.pyx:197",
        "binary_returned_delta": repr(d3m),
        "confirmed": bool(not np.isfinite(d3m)),
    }

    # full-loop parity: reference composed loops vs our drivers
    from cytvdn_tpu import denoise3D, denoise4D
    mu = np.full(4, 1.0, np.float32)
    r_ours, bn_ours, dl_ours = denoise4D(
        inputs["cube"], mu, iterations=8, FISTA=True, quiet=True)[:3]
    report["full_loop"] = {
        "recon_rel_l2": rel(r_ours, ref["loop_recon"]),
        "bnorm_rel_max": float(np.max(np.abs(
            (bn_ours - ref["loop_bnorm"]) / ref["loop_bnorm"]))),
        "delta_rel_max": float(np.max(np.abs(
            (dl_ours - ref["loop_delta"]) / ref["loop_delta"]))),
    }
    mu3 = np.full(3, 1.0, np.float32)
    r3, bn3, dl3 = denoise3D(inputs["cube3"], mu3, iterations=50,
                             quiet=True)[:3]
    report["full_loop_3d_50iter"] = {
        "recon_rel_l2": rel(r3, ref["loop3_recon"]),
        "delta_rel_max": float(np.max(np.abs(
            (dl3 - ref["loop3_delta"]) / ref["loop3_delta"]))),
    }
    rh, bnh, dlh = denoise4D(inputs["cube"], mu, iterations=(4, 4),
                             quiet=True)[:3]
    report["full_loop_hybrid"] = {
        "recon_rel_l2": rel(rh, ref["hyb_recon"]),
        "delta_rel_max": float(np.max(np.abs(
            (dlh - ref["hyb_delta"]) / ref["hyb_delta"]))),
    }
    report["reference_measured"] = {
        "vox_updates_per_sec_1thread_4d_fista_48x48x48x48":
            float(ref["ref_vox_per_sec_1thread"]),
        "note": "actual cyTVDN Cython kernels built for python3.11 "
                "(math untouched; 3 traceback-only build shims)",
    }
    tol = 1e-5
    report["north_star_tolerance"] = tol
    report["pass"] = bool(
        report["full_loop"]["recon_rel_l2"] < tol
        and report["full_loop_3d_50iter"]["recon_rel_l2"] < tol
        and report["full_loop_hybrid"]["recon_rel_l2"] < tol
        # every kernel-level metric gates, not just the accumulators —
        # a regression in the iso or periodic-recon kernels must fail
        and all(v < tol for v in report["kernel_parity"].values())
        and all(d["confirmed"]
                for d in report["defect_confirmations"].values())
    )
    path = os.path.join(REPO, "REFERENCE_PARITY.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
