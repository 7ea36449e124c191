"""
Per-step STORE cost in sequential Pallas kernels (the fused filter issues
~18 tiny (n_block, 1) column stores per step — suspected dominant cost).

Variants (identical 8-FMA math chain per step):
  store18   18 column stores into a (chunk, nb, 18) block per step
  store1    the 18 columns concatenated, ONE (nb, 18) store per step
  store0    no per-step stores (carry only; one store per chunk)

Timing: jit functions return a SCALAR (sum of a tiny slice) — blocking on
a scalar output genuinely waits on this backend, unlike big-array
block_until_ready (see bench.py::_sync).
"""
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_STEPS = 10000
NB = 3
NCOL = 18
B_AMORT = 8


def _kern(variant, chunk, x0_ref, out_ref, scr):
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _init():
        scr[:] = x0_ref[:]

    def body(r, carry):
        cols = list(carry)
        for i in range(NCOL):
            y = cols[i]
            for _ in range(8):
                y = y * (0.999 + 1e-9 * y)
            cols[i] = y
        if variant == "store18":
            for i in range(NCOL):
                out_ref[r, :, i:i + 1] = cols[i]
        elif variant == "store1":
            out_ref[r] = jnp.concatenate(cols, axis=-1)
        return tuple(cols)

    out = jax.lax.fori_loop(
        0, chunk, body, tuple(scr[:, i:i + 1] for i in range(NCOL)))
    for i in range(NCOL):
        scr[:, i:i + 1] = out[i]
    if variant == "store0":
        out_ref[0] = jnp.concatenate(list(out), axis=-1)


def run(variant, chunk, x0):
    n_chunks = N_STEPS // chunk
    out_rows = N_STEPS if variant != "store0" else n_chunks
    blk_rows = chunk if variant != "store0" else 1
    return pl.pallas_call(
        functools.partial(_kern, variant, chunk),
        out_shape=jax.ShapeDtypeStruct((out_rows, NB, NCOL), jnp.float32),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((NB, NCOL), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk_rows, NB, NCOL), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NB, NCOL), jnp.float32)],
    )(x0)


def drain(o):
    """Full-roundtrip sync: the ONLY reliable completion point on this
    backend (scalar block_until_ready and big-array blocks both admit
    pipelined lies)."""
    import numpy as np
    np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]


def measure(fn, x0, K=6):
    """K back-to-back fresh-input calls, one drain, minus roundtrip."""
    o = fn(x0)
    drain(o)
    t0 = time.perf_counter()
    drain(o)
    probe = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(K):
        o = fn(x0 * (1 + 1e-5 * (i + 1)))
    drain(o)
    tot = time.perf_counter() - t0 - probe
    return tot / (K * B_AMORT)


def main():
    res = {}
    for rep in (0, 1):
        for variant in ("store18", "store1", "store0"):
            for chunk, label2 in ((250, ""),):
                fn = jax.jit(lambda xs, v=variant, c=chunk: jax.lax.map(
                    lambda x: run(v, c, x), xs))
                x0 = jnp.ones((B_AMORT, NB, NCOL), jnp.float32) \
                    * (1 + 1e-3 * jnp.arange(B_AMORT)[:, None, None])
                t = measure(fn, x0)
                ns = t * 1e9 / N_STEPS
                res[f"{variant}{label2}_r{rep}"] = round(ns, 1)
                print(f"{variant}{label2}_r{rep}", f"{ns:.1f} ns/step",
                      flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
