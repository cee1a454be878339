"""Root-cause probe for the 4x8/4x16 row-band compile-time blowup
(VERDICT r4 weak #6: "compiles very slowly" — symptom only, no cause).

Times the two halves of a rowband kernel build separately per class:

  1. trace+lower (local: JAX trace -> Pallas -> Mosaic MLIR payload)
  2. backend compile (relay: Mosaic -> LLO; only with --compile)

so the blowup can be attributed to the Python/trace side (fixable by
restructuring the kernel body) or the Mosaic side (fixable by shrinking
the program per grid step).  Run on CPU for (1) only:

  JAX_PLATFORMS=cpu python tools/rb_compile_probe.py 4x8 8x4 4x16 16x4
  python tools/rb_compile_probe.py --compile 4x8 8x4    # relay compile
"""

import sys
import time

import numpy as np

CLASSES = {
    # (w, h, sid): geometry mirrors constants.CU_SHAPES
    "4x8": (4, 8, 1), "8x4": (8, 4, 1), "4x16": (4, 16, 1),
    "16x4": (16, 4, 1), "8x8": (8, 8, 1), "16x8": (16, 8, 2),
    "4x32": (4, 32, 1), "32x4": (32, 4, 1),
}


def build(w, h, sid, *, n_r=16, C=128, k=8):
    import jax
    import jax.numpy as jnp
    from vvc_mip_gpu_tpu.constants import PRED_MODES
    from vvc_mip_gpu_tpu.ops.pallas import pred as pallas_pred
    from vvc_mip_gpu_tpu.ops.pallas.distortion import input_perms
    from vvc_mip_gpu_tpu.ops.pallas.rowband import (
        rowband_distortion, rowband_distortion_mm)

    r = 8 if sid == 2 else 4
    two_m = 2 * PRED_MODES[sid]
    og = jnp.zeros((w, n_r, h, C), jnp.int16)
    rt = jnp.zeros((w, n_r, C), jnp.int16)
    rl = jnp.zeros((n_r, h, C), jnp.int16)
    if sid == 2:
        perm = tuple(int(v) for v in input_perms(h, w, r)[0])
        mat = jnp.asarray(pallas_pred._augmented_matrix(2, perm, False))
        fn = lambda *a: rowband_distortion(
            *a, h=h, w=w, r=r, two_m=two_m, emit="msh_t", k=k)
    else:
        mat = jnp.asarray(pallas_pred._augmented_matrix(sid, None, True))
        fn = lambda *a: rowband_distortion_mm(
            *a, h=h, w=w, r=r, two_m=two_m, bs=4 if sid else 2,
            emit="msh_t", k=k)
    return fn, (og, rt, rl, mat)


def main():
    import jax
    do_compile = "--compile" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "8x4", "4x8", "4x16", "16x4"]
    for name in names:
        w, h, sid = CLASSES[name]
        fn, args = build(w, h, sid)
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.perf_counter()
        line = f"{name}: trace+lower {t1 - t0:8.2f}s"
        txt = lowered.as_text()
        line += f"  (stablehlo {len(txt) / 1e6:.1f} MB)"
        if do_compile:
            t2 = time.perf_counter()
            lowered.compile()
            line += f"  backend-compile {time.perf_counter() - t2:8.2f}s"
        print(line, flush=True)


if __name__ == "__main__":
    main()
