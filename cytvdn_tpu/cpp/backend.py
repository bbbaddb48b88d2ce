"""ctypes bindings + host solver loop for the native CPU kernels.

``solve_cpp`` mirrors the reference driver's control flow exactly
(reference cyTVDN/cyTVDN.py:147-242): per-iteration accumulator updates
(aniso or iso pairs), reconstruction update, optional SSE, early stop,
hybrid FISTA→unaccelerated schedule. It operates on numpy arrays in place
(native kernels), making it both the ``backend="cpp"`` production path on
CPU-only hosts and the reference-performance measurement proxy.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from cytvdn_tpu.config import BCMode, SolverOptions
from cytvdn_tpu.cpp.build import build_native

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        # a stale/foreign binary (or missing libgomp): rebuild once, then
        # degrade gracefully so native_available() returns False
        path = build_native(force=True)
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    dp = ctypes.POINTER(ctypes.c_double)

    for suffix, fptr in (("f32", ctypes.POINTER(ctypes.c_float)),
                         ("f64", dp)):
        acc = getattr(lib, f"tv_acc_update_{suffix}")
        acc.restype = ctypes.c_double
        acc.argtypes = [fptr, fptr, fptr, ctypes.c_double, i64p,
                        ctypes.c_int, ctypes.c_int, ctypes.c_double,
                        ctypes.c_int]
        iso = getattr(lib, f"tv_iso_update_{suffix}")
        iso.restype = ctypes.c_double
        iso.argtypes = [fptr, fptr, fptr, fptr, fptr, ctypes.c_double, i64p,
                        ctypes.c_int, ctypes.c_int, ctypes.c_double]
        r3 = getattr(lib, f"tv_recon_update_3d_{suffix}")
        r3.restype = None
        r3.argtypes = [fptr, fptr, fptr, fptr, fptr, fptr, i64p,
                       ctypes.c_int, dp, dp]
        r4 = getattr(lib, f"tv_recon_update_4d_{suffix}")
        r4.restype = None
        r4.argtypes = [fptr, fptr, fptr, fptr, fptr, fptr, fptr, i64p,
                       ctypes.c_int, dp, dp]
        s = getattr(lib, f"tv_sse_{suffix}")
        s.restype = ctypes.c_double
        s.argtypes = [fptr, fptr, ctypes.c_int64]
    lib.tv_num_threads.restype = ctypes.c_int
    lib.tv_num_threads.argtypes = []
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def native_num_threads() -> int:
    lib = _load()
    return lib.tv_num_threads() if lib else 0


def _suffix(dtype) -> str:
    return "f32" if dtype == np.float32 else "f64"


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(
        ctypes.POINTER(ctypes.c_float if arr.dtype == np.float32
                       else ctypes.c_double)
    )


def _shape_arr(a: np.ndarray):
    return (ctypes.c_int64 * a.ndim)(*a.shape)


def acc_update(a, b, ax, clip, bc, d=None, tk=0.0) -> float:
    """In-place accumulator update; returns the L1 norm of updated b."""
    lib = _load()
    fn = getattr(lib, f"tv_acc_update_{_suffix(a.dtype)}")
    dptr = _ptr(d) if d is not None else None
    return fn(_ptr(a), _ptr(b), dptr, float(tk), _shape_arr(a), a.ndim,
              int(ax), float(clip), int(bc))


def iso_update(a, b1, b2, ax1, ax2, clip, d1=None, d2=None, tk=0.0) -> float:
    lib = _load()
    fn = getattr(lib, f"tv_iso_update_{_suffix(a.dtype)}")
    p1 = _ptr(d1) if d1 is not None else None
    p2 = _ptr(d2) if d2 is not None else None
    return fn(_ptr(a), _ptr(b1), _ptr(b2), p1, p2, float(tk), _shape_arr(a),
              int(ax1), int(ax2), float(clip))


def recon_update(orig, recon, bs, lam_mu, bc) -> float:
    """In-place reconstruction update; returns delta (relative L1 change)."""
    lib = _load()
    dn = ctypes.c_double()
    rn = ctypes.c_double()
    w = np.ascontiguousarray(lam_mu, dtype=orig.dtype)
    if orig.ndim == 3:
        fn = getattr(lib, f"tv_recon_update_3d_{_suffix(orig.dtype)}")
        fn(_ptr(orig), _ptr(recon), _ptr(bs[0]), _ptr(bs[1]), _ptr(bs[2]),
           _ptr(w), _shape_arr(orig), int(bc), ctypes.byref(dn),
           ctypes.byref(rn))
    else:
        fn = getattr(lib, f"tv_recon_update_4d_{_suffix(orig.dtype)}")
        fn(_ptr(orig), _ptr(recon), _ptr(bs[0]), _ptr(bs[1]), _ptr(bs[2]),
           _ptr(bs[3]), _ptr(w), _shape_arr(orig), int(bc),
           ctypes.byref(dn), ctypes.byref(rn))
    # all-zero reconstruction: match the JAX path's 0/0 -> NaN instead of
    # raising ZeroDivisionError (cf. solver/outofcore.py's identical guard)
    return dn.value / rn.value if rn.value else float("nan")


def sum_square_error(a, b) -> float:
    lib = _load()
    fn = getattr(lib, f"tv_sse_{_suffix(a.dtype)}")
    return fn(_ptr(a), _ptr(b), a.size)


def solve_cpp(
    orig: np.ndarray,
    lambda_inv: np.ndarray,
    lam_mu: np.ndarray,
    opts: SolverOptions,
    reference_data: Optional[np.ndarray] = None,
):
    """Full host solver on the native kernels. Same return dict as
    :func:`cytvdn_tpu.solver.engine.run_solver`."""
    if not native_available():
        raise RuntimeError(
            "native CPU backend unavailable (no compiler or build failed)"
        )
    orig = np.ascontiguousarray(orig)
    ndim = opts.ndim
    dtype = orig.dtype
    if reference_data is not None:
        reference_data = np.ascontiguousarray(reference_data, dtype=dtype)
        if reference_data.shape != orig.shape:
            raise ValueError(
                "reference_data shape must match the datacube"
            )
    n_f, n_u = opts.iterations_fista, opts.iterations_unacc
    n_total = n_f + n_u
    stopping = opts.stopping_relative_change
    bc = int(opts.bc_mode)

    accs = [np.zeros_like(orig) for _ in range(ndim)]
    ds = [np.zeros_like(orig) for _ in range(ndim)] if n_f else None
    recon = orig.copy()
    b_norm = np.zeros(n_total, dtype=dtype)
    delta = np.zeros(n_total, dtype=dtype)
    mse = None
    if opts.calculate_mse:
        mse = np.zeros(n_total + 1, dtype=dtype)
        mse[0] = sum_square_error(orig, reference_data)

    def axis_pass(fista: bool, tk_ratio: float) -> float:
        total = 0.0
        if ndim == 4 and opts.isotropic_R:
            total += iso_update(
                recon, accs[0], accs[1], 0, 1, lambda_inv[0],
                ds[0] if fista else None, ds[1] if fista else None, tk_ratio)
            aniso_axes = []
        else:
            aniso_axes = [0, 1] if ndim == 4 else [0, 1, 2]
        if ndim == 4:
            if opts.isotropic_Q:
                total += iso_update(
                    recon, accs[2], accs[3], 2, 3, lambda_inv[2],
                    ds[2] if fista else None, ds[3] if fista else None,
                    tk_ratio)
            else:
                aniso_axes += [2, 3]
        for ax in aniso_axes:
            total += acc_update(
                recon, accs[ax], ax, lambda_inv[ax], bc,
                ds[ax] if fista else None, tk_ratio)
        return total

    it_run = 0
    stopped = False
    tk = 1.0
    for i in range(n_f):
        tk_new = (1.0 + np.sqrt(1.0 + 4.0 * tk * tk)) / 2.0
        tk_ratio = (tk - 1.0) / tk_new
        tk = tk_new
        b_norm[i] = axis_pass(True, tk_ratio)
        delta[i] = recon_update(orig, recon, accs, lam_mu, bc)
        if opts.calculate_mse:
            mse[i + 1] = sum_square_error(reference_data, recon)
        it_run = i + 1
        if stopping is not None and delta[i] < stopping:
            stopped = True
            break
    if n_u:
        stopped = False  # second phase runs regardless (reference behavior)
    for j in range(n_u):
        i = j + n_f
        b_norm[i] = axis_pass(False, 0.0)
        delta[i] = recon_update(orig, recon, accs, lam_mu, bc)
        if opts.calculate_mse:
            mse[i + 1] = sum_square_error(reference_data, recon)
        it_run = i + 1
        if stopping is not None and delta[i] < stopping:
            stopped = True
            break

    out = {
        "recon": recon,
        "b_norm": b_norm,
        "delta": delta,
        "iterations_run": np.int32(it_run),
        "early_stopped": np.bool_(stopped),
    }
    if opts.calculate_mse:
        out["mse"] = mse
    return out
