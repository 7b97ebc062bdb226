"""Microbench: ray-granular compaction gathers at 1080p scale (round 4).

The compacted-tail design needs, at the bounce-2 boundary:
  * src construction: one [N] cumsum + scatter (N = 2.09M rays),
  * ~43 component gathers [N] -> [CN] (CN = C*r ~ 261K),
  * per-bounce color scatter-add [3, CN] -> [3, N].

TPU gathers are fast for wide ROWS and suspect for 1-D element takes —
this measures the real cost of each strategy before the build:
  A. per-component 1-D takes (43 of them),
  B. pack to [N, 48] rows (transpose) then ONE row gather + unpack,
  C. src construction alone,
  D. color scatter-add alone.

    PYTHONPATH=/root/.axon_site:/root/repo python -u experiments/compact_gather_bench.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from rt_rs_tpu.utils.sync import device_sync

T, R = 8160, 256
N = T * R
C = T // 8
CN = C * R
COMPS = 43


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


key = jax.random.PRNGKey(0)
state = jax.random.normal(key, (COMPS, T, R), jnp.float32)
# ~1.5% live, scattered (the bounce-2/3 regime)
live = jax.random.uniform(key, (N,)) < 0.015


@jax.jit
def build_src(live):
    incl = jnp.cumsum(live.astype(jnp.int32))
    dst = jnp.where(live, incl - 1, CN)
    src = jnp.full((CN,), N, jnp.int32).at[dst].set(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    return src, incl[-1]


@jax.jit
def gather_1d(state, src):
    flat = state.reshape(COMPS, N)
    outs = [
        jnp.take(flat[i], src, mode="fill", fill_value=0.0)
        for i in range(COMPS)
    ]
    return jnp.stack(outs).reshape(COMPS, C, R)


@jax.jit
def gather_axis1(state, src):
    flat = state.reshape(COMPS, N)
    return jnp.take(flat, src, axis=1, mode="fill", fill_value=0.0).reshape(
        COMPS, C, R
    )


@jax.jit
def gather_rows(state, src):
    packed = state.reshape(COMPS, N).T  # [N, COMPS] (the big transpose)
    rows = jnp.take(packed, src, axis=0, mode="fill", fill_value=0.0)
    return rows.T.reshape(COMPS, C, R)


@jax.jit
def scatter_color(color, contrib, src):
    return color.reshape(3, N).at[:, src].add(
        contrib.reshape(3, CN), mode="drop"
    ).reshape(3, T, R)


src, cnt = build_src(live)
print(f"live {int(cnt)} of {N}; capacity {CN}", flush=True)
timeit("C. build_src ([N] cumsum+scatter)", build_src, live)
timeit("A. 43x 1-D takes", gather_1d, state, src)
timeit("A'. one axis=1 take [43, N]", gather_axis1, state, src)
timeit("B. transpose-pack + row gather", gather_rows, state, src)
color = jnp.zeros((3, T, R), jnp.float32)
contrib = jnp.ones((3, C, R), jnp.float32)
timeit("D. color scatter-add", scatter_color, color, contrib, src)
