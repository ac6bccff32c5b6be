"""Cross-validation against the reference C binaries (built out-of-tree by
scripts/build_reference.sh into .ref_build/; skipped when absent)."""

import os
import subprocess

import numpy as np
import pytest

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io import formats
from peregrine_tpu.io.seqdb import SeqDB
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.ops.overlap import overlap_chunk
from tests.simdata import random_genome, simulate_reads

from tests.refbuild import REF_BUILD, ensure_ref_build

pytestmark = pytest.mark.skipif(
    ensure_ref_build() is None,
    reason="reference tree unavailable (auto-build failed; "
           "see scripts/build_reference.sh)")


@pytest.fixture
def dataset(tmp_path, rng):
    genome = random_genome(rng, 50000)
    reads, _ = simulate_reads(rng, genome, read_len=8000, coverage=8.0,
                              error=0.01)
    db = SeqDB.from_reads(reads)
    prefix = str(tmp_path / "seq_dataset")
    db.save(prefix)
    return db, prefix, tmp_path


def test_index_byte_parity(dataset):
    """L2 SHIMMER index must be byte-identical to the reference shmr_index
    (defaults k=16 w=80 r=6, two levels)."""
    db, prefix, tmp = dataset
    subprocess.run([os.path.join(REF_BUILD, "shmr_index"), "-p", prefix,
                    "-t", "1", "-c", "1", "-o", str(tmp / "ref_shmr")],
                   check=True, capture_output=True, cwd=tmp)
    rx, ry = formats.read_mmlist(str(tmp / "ref_shmr-L2-01-of-01.dat"))
    rh, rc = formats.read_mm_count(str(tmp / "ref_shmr-L2-MC-01-of-01.dat"))

    idx = build_index(db, AsmConfig())
    np.testing.assert_array_equal(rx, idx.x)
    np.testing.assert_array_equal(ry, idx.y)
    assert dict(zip(rh.tolist(), rc.tolist())) == \
        dict(zip(idx.mc_hash.tolist(), idx.mc_count.tolist()))


def test_overlap_pair_parity(dataset):
    """Overlap rid-pair sets must closely agree with reference
    shmr_overlap | shmr_dedup (bucket iteration order differs: the
    reference iterates khash order, we iterate canonical sorted order —
    bestn pruning makes exact record parity impossible by design)."""
    db, prefix, tmp = dataset
    subprocess.run([os.path.join(REF_BUILD, "shmr_index"), "-p", prefix,
                    "-t", "1", "-c", "1", "-o", str(tmp / "ref_shmr")],
                   check=True, capture_output=True, cwd=tmp)
    ov = subprocess.run([os.path.join(REF_BUILD, "shmr_overlap"),
                         "-p", prefix, "-l", str(tmp / "ref_shmr-L2"),
                         "-t", "1", "-c", "1", "-o", str(tmp / "ovlp.1")],
                        check=True, capture_output=True, cwd=tmp)
    with open(tmp / "ovlp.1", "rb") as f:
        dd = subprocess.run([os.path.join(REF_BUILD, "shmr_dedup")],
                            stdin=f, capture_output=True, check=True)
    ref_pairs = set()
    for line in dd.stdout.decode().splitlines():
        t = line.split()
        ref_pairs.add(tuple(sorted((t[0], t[1]))))

    idx = build_index(db, AsmConfig())
    ovlps = overlap_chunk(db, idx, AsmConfig())
    my_pairs = {tuple(sorted((f"{int(o['y0'] >> np.uint64(32)):09d}",
                              f"{int(o['y1'] >> np.uint64(32)):09d}")))
                for o in ovlps}
    inter = len(ref_pairs & my_pairs)
    union = len(ref_pairs | my_pairs)
    jaccard = inter / max(union, 1)
    assert jaccard > 0.9, (f"overlap pair jaccard {jaccard:.3f} "
                           f"(ref {len(ref_pairs)}, mine {len(my_pairs)})")
