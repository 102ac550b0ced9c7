"""Single-chip sanity launch of the PRODUCTION Mosaic-under-shard_map
composition at bench shape (VERDICT r2 weak #2: the sharded pallas path
had only ever executed at G=8/B=16/N=128 in interpret mode or the tiny
dryrun).  A 1-device mesh on the real chip exercises the exact
shard_map + Mosaic lowering used multi-chip, at the production shape
(G=64, B=1024, N=512, 360 aa query), and checks bit-equality against
the plain (unsharded) grouped kernel plus the launch rate.

Usage: python tools/chip_sharded_sanity.py  (one TPU process at a time)
"""
import os
import sys
import time

import numpy as np

# run from any checkout location; cache dir stays the environment's choice
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from sift4g_tpu.align.pallas_sw import PAD_CODE, sw_scores_pallas_grouped
    from sift4g_tpu.align.xla import _extend_matrix
    from sift4g_tpu.core.scorers import create_scorer
    from sift4g_tpu.parallel.sharded import make_grouped_sharded, make_mesh

    print("devices:", jax.devices())
    G, B, N, m = 64, 1024, 512, 360
    scorer = create_scorer("BLOSUM_62", 10, 1)
    m32 = jnp.asarray(_extend_matrix(scorer.matrix))
    rng = np.random.default_rng(7)

    m_pad = -(-m // 64) * 64
    q_all = np.full(G * m_pad, PAD_CODE, dtype=np.int32)
    for g in range(G):
        q_all[g * m_pad : g * m_pad + m] = rng.integers(0, 26, m)
    q_off = (np.arange(G) * m_pad).astype(np.int32)
    q_len = np.full(G, m, dtype=np.int32)
    tg = rng.integers(0, 26, (G, B, N)).astype(np.int8)
    tl = rng.integers(N // 2, N, (G, B)).astype(np.int32)

    mesh = make_mesh(len(jax.devices()))
    fn = make_grouped_sharded(
        mesh, max_qlen=m_pad, max_sub=int(scorer.matrix.max()),
        kernel="pallas",
    )
    args = (jnp.asarray(q_all), jnp.asarray(q_off), jnp.asarray(q_len))

    t0 = time.perf_counter()
    sharded = np.asarray(fn(*args, jnp.asarray(tg), jnp.asarray(tl), m32))
    print(f"sharded cold: {time.perf_counter() - t0:.1f}s")

    # bit-equality vs the plain single-device grouped kernel
    plain = np.asarray(
        sw_scores_pallas_grouped(
            *args, jnp.asarray(tg), jnp.asarray(tl), m32,
            max_qlen=m_pad, max_sub=int(scorer.matrix.max()),
        )
    )
    np.testing.assert_array_equal(sharded, plain)
    print("bit-equality sharded == plain grouped: OK")

    # warm rate, unique inputs + forced fetch (platform measurement rules);
    # pre-stage the device arrays like bench.py — a (G,B,N) int8 upload
    # through the relay costs hundreds of ms and is not the kernel's cost
    cells = float(G) * m * B * N  # padded upper bound; rate is indicative
    # fully unique inputs per timed launch (targets AND lens) so dispatch
    # deduplication can never kick in
    staged = [
        (
            jnp.asarray(rng.integers(0, 26, (G, B, N)).astype(np.int8)),
            jnp.asarray(rng.integers(N // 2, N, (G, B)).astype(np.int32)),
        )
        for _ in range(6)
    ]
    times = []
    for tg_i, tl_i in staged:
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args, tg_i, tl_i, m32))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"sharded warm best-of-6: {best * 1e3:.1f} ms = "
        f"{cells / best / 1e9:.1f} padded GCUPS (plain-kernel bench ref: 48.3)"
    )


if __name__ == "__main__":
    main()
