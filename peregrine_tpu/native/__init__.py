"""Native host runtime: ctypes bindings to the C++ alignment kernels.

The shared object is compiled on demand from the committed C++ sources
(g++ -O3) into this package directory; rebuilds happen automatically when
sources are newer than the binary.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = [os.path.join(_DIR, "dw_align.cpp"),
        os.path.join(_DIR, "consensus.cpp")]
_SO = os.path.join(_DIR, "_pgnative.so")


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO] + _SRC
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    need = (not os.path.exists(_SO)
            or any(os.path.getmtime(s) > os.path.getmtime(_SO) for s in _SRC))
    if need:
        _build()
    return ctypes.CDLL(_SO)


class OvlpMatch(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in
                ("m_size", "dist", "q_bgn", "q_end", "t_bgn", "t_end",
                 "t_m_end", "q_m_end")]


class _Alignment(ctypes.Structure):
    _fields_ = [("aln_str_size", ctypes.c_int32), ("dist", ctypes.c_int32),
                ("aln_q_s", ctypes.c_int32), ("aln_q_e", ctypes.c_int32),
                ("aln_t_s", ctypes.c_int32), ("aln_t_e", ctypes.c_int32),
                ("q_aln_str", ctypes.c_void_p), ("t_aln_str", ctypes.c_void_p)]


_lib = _load()
_lib.ovlp_match_c.argtypes = [
    ctypes.c_char_p, ctypes.c_int32, ctypes.c_uint8,
    ctypes.c_char_p, ctypes.c_int32, ctypes.c_uint8,
    ctypes.c_int32, ctypes.POINTER(OvlpMatch)]
_lib.dw_align_c.argtypes = [
    ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
    ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(_Alignment)]
_lib.free_alignment_c.argtypes = [ctypes.POINTER(_Alignment)]


def ovlp_match(query: bytes | np.ndarray, q_strand: int,
               target: bytes | np.ndarray, t_strand: int,
               band_tolerance: int) -> OvlpMatch:
    """Overlap-confirm alignment on 4-bit packed sequences.

    Semantics mirror the reference overlap aligner (src/DWmatch.c:66-204);
    strand selects the nibble (0 = forward low nibble, 1 = complement high).
    """
    qb = bytes(query) if not isinstance(query, bytes) else query
    tb = bytes(target) if not isinstance(target, bytes) else target
    out = OvlpMatch()
    _lib.ovlp_match_c(qb, len(qb), q_strand, tb, len(tb), t_strand,
                      band_tolerance, ctypes.byref(out))
    return out


class DwAlignment:
    """Gapped alignment result with explicit alignment strings."""

    __slots__ = ("aln_str_size", "dist", "aln_q_s", "aln_q_e", "aln_t_s",
                 "aln_t_e", "q_aln_str", "t_aln_str")

    def __init__(self, a: _Alignment):
        self.aln_str_size = a.aln_str_size
        self.dist = a.dist
        self.aln_q_s = a.aln_q_s
        self.aln_q_e = a.aln_q_e
        self.aln_t_s = a.aln_t_s
        self.aln_t_e = a.aln_t_e
        n = a.aln_str_size
        self.q_aln_str = ctypes.string_at(a.q_aln_str, n) if a.q_aln_str else b""
        self.t_aln_str = ctypes.string_at(a.t_aln_str, n) if a.t_aln_str else b""


class _CnsResult(ctypes.Structure):
    _fields_ = [("seq", ctypes.c_void_p), ("len", ctypes.c_int32)]


_lib.window_cns_c.argtypes = [
    ctypes.c_char_p, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(_CnsResult)]
_lib.free_cns_c.argtypes = [ctypes.POINTER(_CnsResult)]


def window_cns(ref_seq: bytes, read_seqs: list[bytes], shifts: list[int],
               band: int, min_cov: int) -> bytes:
    """Native consensus of one template window (backbone + read alignments
    + tag pileup + max-weight path; semantics of falcon/falcon.c via
    ops/consensus.py)."""
    n = len(read_seqs)
    arr = (ctypes.c_char_p * n)(*read_seqs)
    lens = (ctypes.c_int32 * n)(*[len(s) for s in read_seqs])
    sh = (ctypes.c_int32 * n)(*shifts)
    out = _CnsResult()
    _lib.window_cns_c(ref_seq, len(ref_seq), arr, lens, sh, n,
                      band, min_cov, ctypes.byref(out))
    try:
        return ctypes.string_at(out.seq, out.len) if out.seq else b""
    finally:
        _lib.free_cns_c(ctypes.byref(out))


def dw_align(query: bytes, target: bytes, band_tolerance: int,
             get_aln_str: bool = True) -> DwAlignment:
    """Banded O(ND) alignment with traceback on ASCII sequences
    (semantics: reference falcon/DW_banded.c:104-315)."""
    a = _Alignment()
    _lib.dw_align_c(query, len(query), target, len(target),
                    band_tolerance, 1 if get_aln_str else 0, ctypes.byref(a))
    try:
        return DwAlignment(a)
    finally:
        _lib.free_alignment_c(ctypes.byref(a))
