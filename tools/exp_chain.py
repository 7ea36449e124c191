"""
Microbenchmark: per-step cost structure of a sequential Pallas dependency
chain on the TPU (what sets the fused filter's ~700 ns/step?).

Kernel body per step: L dependent FMAs on a column of shape SHAPE, then a
store.  Sweeping L gives ns per dependent op (slope) and fixed per-step
overhead (intercept); sweeping SHAPE tests whether tiny (3,1) columns pay
the same as full (8,128) registers; unroll tests loop overhead.
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
B_AMORT = 8


def timeit(fn_one, xs, n_rep=5):
    fn = jax.jit(lambda xs_: jax.lax.map(fn_one, xs_))
    out = fn(xs)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    best = 1e9
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = fn(xs)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        best = min(best, (time.perf_counter() - t0) / B_AMORT)
    return best * 1e3


def _chain_kernel(L, chunk, shape, unroll, x0_ref, out_ref, scr):
    gi = pl.program_id(0)

    @pl.when(gi == 0)
    def _init():
        scr[:] = x0_ref[:]

    def body(r, y):
        for _ in range(L):
            # nonlinear dependent op: cannot be folded into one affine map
            y = y * (0.999 + 1e-9 * y)
        out_ref[r] = y
        return y

    y = jax.lax.fori_loop(0, chunk, body, scr[:],
                          unroll=True if unroll else 1)
    scr[:] = y


def chain(L, shape, unroll, chunk, x0):
    n_chunks = N_STEPS // chunk
    kern = functools.partial(_chain_kernel, L, chunk, shape, unroll)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N_STEPS,) + shape, jnp.float32),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec(shape, lambda i: (0,) * (len(shape) + 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk,) + shape, lambda i: (i,) + (0,) * len(shape),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(shape, jnp.float32)],
    )(x0)


def main():
    res = {}
    for shape in ((3, 1), (8, 128)):
        x0 = jnp.ones((B_AMORT,) + shape, jnp.float32) \
            * (1 + 1e-3 * jnp.arange(B_AMORT)[:, None, None])
        for L in (1, 8, 32, 96):
            for unroll, chunk in ((False, 250), (True, 16)):
                label = (f"L{L}_s{shape[0]}x{shape[1]}"
                         + ("_unroll" if unroll else ""))
                t = timeit(lambda x, L=L, u=unroll, c=chunk:
                           chain(L, shape, u, c, x), x0)
                ns_per_step = t * 1e6 / N_STEPS
                res[label] = round(ns_per_step, 1)
                print(label, f"{ns_per_step:.1f} ns/step", flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
