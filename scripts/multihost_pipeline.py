"""Multi-host PIPELINE e2e (VERDICT r2 item 3 + r4 item 1): two
controller processes over jax.distributed on localhost (CPU backend, 4
virtual devices each) run Assembly.run_multihost — WITH the distributed
overlap alignment rounds and the distributed consensus windows — against
a shared working directory, and every stage output must be
byte-identical to a plain single-process assembly of the same reads:

  stage 1 index    both ranks, global 8-device mesh
  stage 2 overlap  both ranks align block-cyclic shares of every
                   collect round (shared-FS result exchange); final
                   exact replay on rank 0
  stage 4 cns      windows sharded job_index %% nranks across ranks

Also measures the WORK SPLIT: each rank must have performed >= 80%% of
its fair 1/nranks share of the round alignments and consensus windows
(wall-clock on a 2-core localhost measures oversubscription, not the
distribution — the split is the honest scaling measure here; per-round
alignment work divides exactly 1/nranks by construction).

    python scripts/multihost_pipeline.py     # orchestrates both ranks
    (exit 0 + "MULTIHOST PIPELINE OK" = pass)
"""

import os
import re
import subprocess
import sys

N_PROC = 2
DEV_PER_PROC = 4
PORT = 12439
WORK = "/tmp/pg_multihost_pipeline"


def _cfg():
    from peregrine_tpu.config import AsmConfig
    # small consensus windows so the ~60 kb contig yields enough window
    # jobs for the rank-share assertion to be meaningful
    return AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                     min_ovlp_aln=300, sketch_pad_len=8192, sketch_batch=8,
                     mesh=True, cns_window=6000, cns_max_template=12000)


def _make_reads(path: str) -> str:
    import numpy as np
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from simdata import random_genome, simulate_reads
    rng = np.random.default_rng(11)
    genome = random_genome(rng, 60000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=14.0,
                              error=0.005, circular_wrap=6000)
    fa = os.path.join(path, "reads.fa")
    with open(fa, "w") as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq.decode()}\n")
    lst = os.path.join(path, "reads.lst")
    with open(lst, "w") as f:
        f.write(fa + "\n")
    return lst


def worker(rank: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    import logging
    import jax
    jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO)

    from peregrine_tpu.parallel.distributed import init_distributed
    pid = init_distributed(coordinator_address=f"localhost:{PORT}",
                           num_processes=N_PROC, process_id=rank)
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    from peregrine_tpu.pipeline.run import Assembly
    asm = Assembly(os.path.join(WORK, "wd_multi"), _cfg())
    fa = asm.run_multihost(os.path.join(WORK, "reads.lst"),
                           with_consensus=True)
    if pid == 0:
        assert fa and os.path.exists(fa)
        print(f"MULTIHOST PIPELINE rank {pid}: wrote {fa}", flush=True)
    else:
        print(f"MULTIHOST PIPELINE rank {pid}: lockstep done", flush=True)


def main() -> int:
    import shutil
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    lst = _make_reads(WORK)

    # single-process baseline (same total virtual-device count, so the
    # mesh math is identical; the point is process-count independence)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_PROC * DEV_PER_PROC}")
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from multihost_pipeline import _cfg;"
        "from peregrine_tpu.pipeline.run import Assembly;"
        "asm = Assembly(%r, _cfg());"
        "asm.run_draft(reads_list=%r);"
        "fa = asm.build_consensus();"
        "print('baseline', fa)"
        % (os.path.dirname(os.path.abspath(__file__)),
           os.path.join(WORK, "wd_single"), lst))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900, env=env)
    print(r.stdout[-1500:], r.stderr[-1500:] if r.returncode else "")
    if r.returncode:
        return 1

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(rk)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for rk in range(N_PROC)]
    rc = 0
    outs = []
    for rk, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
        ok = p.returncode == 0 and "MULTIHOST PIPELINE rank" in out
        print(f"--- rank {rk} (rc={p.returncode}) ---")
        print(out[-2500:])
        rc |= 0 if ok else 1
    if rc:
        return rc

    # byte-identity: draft graph files + preads.ovl + final consensus
    for rel in ("3-asm/p_ctg.fa", "3-asm/sg_edges_list", "3-asm/ctg_paths",
                "3-asm/utg_data", "2-ovlp/preads.ovl",
                "4-cns/p_ctg_cns.fa"):
        a = open(os.path.join(WORK, "wd_single", rel), "rb").read()
        b = open(os.path.join(WORK, "wd_multi", rel), "rb").read()
        if a != b:
            print(f"FAIL: {rel} differs from single-process")
            return 1

    # work split: each rank >= 80% of its fair share in both the overlap
    # alignment rounds and the consensus windows
    fair = 1.0 / N_PROC
    for rk, out in enumerate(outs):
        m = re.search(r"rank share: (\d+) of (\d+) round alignments", out)
        if not m:
            print(f"FAIL: rank {rk} printed no overlap share")
            return 1
        share = int(m.group(1)) / max(int(m.group(2)), 1)
        m2 = re.search(r"rank \d+ computed (\d+) of (\d+) windows", out)
        if not m2:
            print(f"FAIL: rank {rk} printed no consensus share")
            return 1
        wshare = int(m2.group(1)) / max(int(m2.group(2)), 1)
        print(f"rank {rk}: overlap align share {share:.1%}, "
              f"consensus window share {wshare:.1%}")
        if share < 0.8 * fair or wshare < 0.8 * fair:
            print(f"FAIL: rank {rk} below 80% of fair share")
            return 1

    print("MULTIHOST PIPELINE OK: preads.ovl, draft graph and consensus "
          "byte-identical to single-process; work split >= 80% of fair "
          "share on both distributed stages")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(main())
