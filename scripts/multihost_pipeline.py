"""Multi-host PIPELINE e2e (VERDICT r2 item 3): two controller processes
over jax.distributed on localhost (CPU backend, 4 virtual devices each)
run Assembly.run_multihost against a shared working directory — rank 0
executes the host stages, both ranks execute stage 1 over the global
8-device mesh — and the resulting draft contigs must be byte-identical
to a plain single-process assembly of the same reads.

    python scripts/multihost_pipeline.py     # orchestrates both ranks
    (exit 0 + "MULTIHOST PIPELINE OK" = pass)
"""

import os
import subprocess
import sys

N_PROC = 2
DEV_PER_PROC = 4
PORT = 12439
WORK = "/tmp/pg_multihost_pipeline"


def _cfg():
    from peregrine_tpu.config import AsmConfig
    return AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                     min_ovlp_aln=300, sketch_pad_len=8192, sketch_batch=8,
                     mesh=True)


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
    import jax
    jax.config.update("jax_platforms", "cpu")

    from peregrine_tpu.parallel.distributed import init_distributed
    pid = init_distributed(coordinator_address=f"localhost:{PORT}",
                           num_processes=N_PROC, process_id=rank)
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    from peregrine_tpu.pipeline.run import Assembly
    asm = Assembly(os.path.join(WORK, "wd_multi"), _cfg())
    fa = asm.run_multihost(os.path.join(WORK, "reads.lst"))
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

    # single-process baseline (same virtual-device count as the pair,
    # so the mesh shape differs: 8 global devices vs 8 — identical; the
    # point is process-count independence)
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_PROC * DEV_PER_PROC}")
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0, %r);"
        "from multihost_pipeline import _cfg;"
        "from peregrine_tpu.pipeline.run import Assembly;"
        "fa = Assembly(%r, _cfg()).run_draft(reads_list=%r);"
        "print('baseline', fa)"
        % (os.path.dirname(os.path.abspath(__file__)),
           os.path.join(WORK, "wd_single"), lst))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900)
    print(r.stdout[-1500:], r.stderr[-1500:] if r.returncode else "")
    if r.returncode:
        return 1

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(rk)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for rk in range(N_PROC)]
    rc = 0
    for rk, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        ok = p.returncode == 0 and "MULTIHOST PIPELINE rank" in out
        print(f"--- rank {rk} (rc={p.returncode}) ---")
        print(out[-2500:])
        rc |= 0 if ok else 1
    if rc:
        return rc

    single = open(os.path.join(WORK, "wd_single", "3-asm", "p_ctg.fa"),
                  "rb").read()
    multi = open(os.path.join(WORK, "wd_multi", "3-asm", "p_ctg.fa"),
                 "rb").read()
    if single != multi:
        print("FAIL: multi-process contigs differ from single-process")
        return 1
    for f in ("sg_edges_list", "ctg_paths", "utg_data"):
        a = open(os.path.join(WORK, "wd_single", "3-asm", f), "rb").read()
        b = open(os.path.join(WORK, "wd_multi", "3-asm", f), "rb").read()
        if a != b:
            print(f"FAIL: {f} differs")
            return 1
    print("MULTIHOST PIPELINE OK: contigs byte-identical to single-process")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(main())
