"""Device-consensus prototype measurement (VERDICT r1 item 6).

Question: would the SURVEY §7.1 batched pileup (dense tag scatter/sort-add
+ scan DP on device) beat the host C++ window core (native/consensus.cpp,
~0.09 s per 100 kb window at 30x)?

This measures the decision-relevant pieces on one representative window
(50 kb template, 30x 15 kb reads, 1% error — the pipeline's actual unit of
work, cfg.cns_window=50000):

  host_total      — the native window core end-to-end (the incumbent)
  host_tags       — alignment + tag generation alone (stays on host in any
                    split design: the device Myers kernel has no traceback,
                    and BENCH.md's op-count analysis already closed the
                    device-traceback question)
  tag_transfer    — host->device transfer of the packed tag stream (the
                    unavoidable cost of a host-align + device-DP split)
  device_sort     — device lax.sort + run-length edge counting (the pileup)
  scan_step_cost  — per-step cost of a T-step lax.scan carrying [D*5]
                    max-plus scores (structural stand-in for the DP walk;
                    upper-bounds what a real DP could achieve per step)

Run: python scripts/proto_device_cns.py [--cpu]
Results and the build/no-build decision are recorded in BENCH.md.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tlen", type=int, default=50000)
    ap.add_argument("--coverage", type=float, default=30.0)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from peregrine_tpu.native import dw_align, window_cns
    from peregrine_tpu.ops.consensus import get_align_tags

    rng = np.random.default_rng(3)
    b2a = np.frombuffer(b"ACGT", np.uint8)
    tpl = rng.integers(0, 4, args.tlen).astype(np.uint8)
    rl = 15000
    step = int(rl / args.coverage)
    reads, shifts = [], []
    for s in range(0, args.tlen - rl + 1, step):
        r = tpl[s:s + rl].copy()
        err = rng.random(rl) < 0.01
        r[err] = (r[err] + rng.integers(1, 4, int(err.sum()))) % 4
        reads.append(b2a[r].tobytes())
        shifts.append(s)
    ref = b2a[tpl].tobytes()
    print(f"window: {args.tlen} bp template, {len(reads)} reads", flush=True)

    # --- host incumbent -------------------------------------------------
    window_cns(ref, reads, shifts, 150, 1)  # warm
    t0 = time.time()
    for _ in range(3):
        out = window_cns(ref, reads, shifts, 150, 1)
    host_total = (time.time() - t0) / 3
    print(f"host_total        {host_total * 1000:8.1f} ms  "
          f"(cns {len(out)} bp)", flush=True)

    # --- host tags (irreducible host share of a split design) -----------
    t0 = time.time()
    all_tags = []
    for seq, sh in zip(reads, shifts):
        a = dw_align(seq, ref[sh:sh + rl + 200], 150)
        if a.aln_str_size:
            all_tags.append(
                get_align_tags(a.q_aln_str, a.t_aln_str, a.aln_q_s,
                               a.aln_t_s, sh))
    host_tags = time.time() - t0
    n_tags = sum(len(t) for t in all_tags)
    print(f"host_tags         {host_tags * 1000:8.1f} ms  "
          f"({n_tags} tags)", flush=True)

    # pack tags: (tpos 17b | delta 8b | base 3b | pdelta 8b | pbase 3b)
    flat = np.concatenate([np.asarray(t, np.int64) for t in all_tags])
    keys = ((flat[:, 0].astype(np.uint64) << np.uint64(22))
            | (np.minimum(flat[:, 1], 255).astype(np.uint64) << np.uint64(14))
            | ((flat[:, 2] & 7).astype(np.uint64) << np.uint64(11))
            | (np.minimum(flat[:, 4], 255).astype(np.uint64) << np.uint64(3))
            | (flat[:, 5] & 7).astype(np.uint64))

    # --- transfer + device sort/count (the pileup) ----------------------
    dev_keys = jax.device_put(keys)
    jax.block_until_ready(dev_keys)  # warm path/alloc
    t0 = time.time()
    dev_keys = jax.device_put(keys)
    jax.block_until_ready(dev_keys)
    tag_transfer = time.time() - t0
    print(f"tag_transfer      {tag_transfer * 1000:8.1f} ms  "
          f"({keys.nbytes / 1e6:.1f} MB)", flush=True)

    @jax.jit
    def sort_count(k):
        s = jnp.sort(k)
        newseg = jnp.concatenate([jnp.ones(1, bool), s[1:] != s[:-1]])
        # run-length edge counts via segment boundaries
        idx = jnp.cumsum(newseg.astype(jnp.int32)) - 1
        counts = jnp.zeros(k.shape[0], jnp.int32).at[idx].add(1)
        return s, counts

    jax.block_until_ready(sort_count(dev_keys))
    t0 = time.time()
    for _ in range(3):
        r = sort_count(dev_keys)
    jax.block_until_ready(r)
    device_sort = (time.time() - t0) / 3
    print(f"device_sort+count {device_sort * 1000:8.1f} ms", flush=True)

    # --- scan DP structural cost ----------------------------------------
    # carry [D*5] scores over T template positions; per step a max-plus
    # against a [D5, D5] dense edge-score tile (upper bound of the real
    # sparse DP's per-step work), batched over B windows
    D5 = 16 * 5
    for B in (1, 64):
        edges = jnp.asarray(rng.standard_normal((args.tlen, D5, D5)),
                            jnp.float32)

        @jax.jit
        def dp(edges):
            def stepf(score, e):
                ns = jnp.max(score[:, :, None] + e[None], axis=1)
                return ns, ns.max(axis=1)
            init = jnp.zeros((B, D5), jnp.float32)
            _, best = jax.lax.scan(stepf, init, edges)
            return best

        jax.block_until_ready(dp(edges))
        t0 = time.time()
        jax.block_until_ready(dp(edges))
        scan_t = time.time() - t0
        print(f"scan_dp T={args.tlen} B={B:3d}  {scan_t * 1000:8.1f} ms "
              f"({scan_t / args.tlen * 1e6:.2f} us/step, "
              f"{scan_t / B * 1000:.1f} ms/window)", flush=True)


if __name__ == "__main__":
    main()
