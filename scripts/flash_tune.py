"""Sweep Pallas flash-attention block sizes at the production shapes.

VERDICT round-1 weak #2: the stock-config flash kernel loses to XLA attention
at seq 128 (82 vs 66.5 ms/step full train step). This harness isolates the
attention op (12-layer-equivalent loop, b64, h12, hd64) and sweeps BlockSizes
at L in {96, 128} to find whether ANY tiling beats XLA at short sequences, or
to put sweep evidence behind the "long-seq only" demotion documented in
models/encoder.py:48-67 and RESULTS.md.

Value-fetch timed (block_until_ready is unreliable on the axon backend).
Run on the real chip: python scripts/flash_tune.py
"""

import itertools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args):
    out = fn(*args)  # compile
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        for _j in range(10):
            out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, (time.perf_counter() - t0) / 10)
    return best * 1e3  # ms


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    B, H, HD = 64, 12, 64
    rng = np.random.default_rng(0)
    for L in (96, 128):
        q = jnp.asarray(rng.standard_normal((B, H, L, HD)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, L, HD)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, L, HD)), jnp.bfloat16)
        seg = SegmentIds(q=jnp.ones((B, L), jnp.int32),
                         kv=jnp.ones((B, L), jnp.int32))

        @jax.jit
        def xla_attn(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) / np.sqrt(HD)
            p = jax.nn.softmax(s, -1).astype(jnp.bfloat16)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                              preferred_element_type=jnp.float32)

        print(f"L={L} xla: {timed(xla_attn, q, k, v):.3f} ms")

        for bq, bkv in itertools.product((32, 64, 96, 128), repeat=2):
            if bq > L or bkv > L:
                continue
            try:
                bs = BlockSizes(
                    block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bkv,
                    block_k_dkv=bkv, block_q_dkv=bq,
                    block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq)
                fn = jax.jit(lambda q, k, v, bs=bs: flash_attention(
                    q, k, v, segment_ids=seg, sm_scale=1.0 / np.sqrt(HD),
                    block_sizes=bs))
                ms = timed(fn, q, k, v)
                print(f"L={L} flash bq={bq} bkv={bkv}: {ms:.3f} ms")
            except Exception as e:
                print(f"L={L} flash bq={bq} bkv={bkv}: FAIL {str(e)[:80]}")


if __name__ == "__main__":
    main()
