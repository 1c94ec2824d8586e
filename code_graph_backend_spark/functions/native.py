"""Runtime-compiled C kernels for driver-local hot loops (ctypes).

The measured-size duality runs sub-cap graph kernels driver-local in
numpy (operators/undirected.py memos). For most kernels numpy's fused
ufuncs are at memory bandwidth already, but an *indexed scatter-max*
(`np.maximum.at`) has no vectorized form: it is a strict serial loop
over (index, value) pairs, and the ANF hop expansion pushes hundreds of
millions of such updates per query (guide §1.2: once the job shape is
right, make the per-task loop fast). A 20-line C loop compiled once per
session does the same update at ~5x the throughput single-threaded and,
because updates can be partitioned into *disjoint receiver ranges*,
scales across threads (ctypes releases the GIL for the call's duration).

Strictly optional: `load_kernels()` returns None when no C compiler is
available or anything about the build fails, and every caller keeps its
numpy path as the fallback (tests pin the two paths equal). The .so is
cached under the system temp dir keyed by a hash of the source, so one
compile (~0.2 s) serves every later session on the box.

No third-party code, no network: the source below is the whole kernel.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stdint.h>

/* flat[rcv[e]*256 + (pk >> 6)] = max(..., pk) for every nonzero packed
   register pk of snd[e], for e in [lo, hi).  Callers partition [0, n_e)
   into ranges that do not split a receiver run, so concurrent calls
   write disjoint slices of `flat` and need no atomics. */
void anf_scatter_max(
    uint16_t *flat,
    const int32_t *rcv,        /* edge receivers (positional), run-sorted */
    const int32_t *snd,        /* edge senders   (positional) */
    const int64_t *starts,     /* CSR offsets into pks per sender, len n+1 */
    const uint16_t *pks,       /* nonzero packed registers, node-major */
    int64_t lo, int64_t hi)
{
    for (int64_t e = lo; e < hi; e++) {
        uint16_t *row = flat + ((int64_t)rcv[e] << 8);
        const int64_t s = snd[e];
        const int64_t k1 = starts[s + 1];
        for (int64_t k = starts[s]; k < k1; k++) {
            const uint16_t pk = pks[k];
            uint16_t *p = row + (pk >> 6);
            if (*p < pk) *p = pk;
        }
    }
}

/* Single-register variant for the seed hop: every sender holds exactly
   one packed register, seed[s]. */
void anf_scatter_max1(
    uint16_t *flat,
    const int32_t *rcv,
    const int32_t *snd,
    const uint16_t *seed,
    int64_t lo, int64_t hi)
{
    for (int64_t e = lo; e < hi; e++) {
        const uint16_t pk = seed[snd[e]];
        uint16_t *p = flat + ((int64_t)rcv[e] << 8) + (pk >> 6);
        if (*p < pk) *p = pk;
    }
}

/* Per-node exact harmonic denominator and zero-register count straight
   from the packed flat state: s_int[v] = 256*2^49 + sum over nonzero
   registers of (2^(49-m) - 2^49), zv[v] = #zero registers.  One read
   pass over flat[lo*256, hi*256), no temporaries (the numpy form
   gathers a (n,256) int64 matrix — ~381 MB at sf0.1).  Node ranges are
   disjoint, so threads need no atomics. */
void anf_estimate(
    const uint16_t *flat,
    int64_t *s_int,
    int64_t *zv,
    int64_t lo, int64_t hi)
{
    static const int64_t BASE = (int64_t)256 << 49;
    for (int64_t v = lo; v < hi; v++) {
        const uint16_t *row = flat + (v << 8);
        int64_t s = BASE;
        int64_t z = 256;
        for (int b = 0; b < 256; b++) {
            const int m = row[b] & 63;
            if (m) {
                s += ((int64_t)1 << (49 - m)) - ((int64_t)1 << 49);
                z--;
            }
        }
        s_int[v] = s;
        zv[v] = z;
    }
}
"""

_LIB = None
_TRIED = False


def load_kernels():
    """ctypes CDLL with the kernels above, or None when unavailable.
    Compiled once per box (content-hashed .so in the temp dir)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        h = hashlib.sha256(_SRC.encode()).hexdigest()[:16]
        so = os.path.join(tempfile.gettempdir(), f"cgb_native_{h}.so")
        if not os.path.exists(so):
            with tempfile.TemporaryDirectory() as td:
                c = os.path.join(td, "kernels.c")
                with open(c, "w") as fh:
                    fh.write(_SRC)
                tmp_so = os.path.join(td, "kernels.so")
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", tmp_so, c],
                    check=True, capture_output=True, timeout=120,
                )
                os.replace(tmp_so, so)  # atomic publish
        lib = ctypes.CDLL(so)
        i64, u16p, i32p, i64p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        )
        lib.anf_scatter_max.argtypes = [u16p, i32p, i32p, i64p, u16p, i64, i64]
        lib.anf_scatter_max.restype = None
        lib.anf_scatter_max1.argtypes = [u16p, i32p, i32p, u16p, i64, i64]
        lib.anf_scatter_max1.restype = None
        lib.anf_estimate.argtypes = [u16p, i64p, i64p, i64, i64]
        lib.anf_estimate.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def receiver_cuts(rcv, n_threads: int, spans_per_thread: int = 6):
    """Edge-range boundaries for [0, len(rcv)) that never split one
    receiver's run (rcv must be run-sorted): concurrent anf_scatter_max
    calls over adjacent ranges then write disjoint `flat` slices.

    Emits ~spans_per_thread ranges per thread, not one: the pool then
    WORK-STEALS — on this round's host the hypervisor freezes single
    vCPUs for seconds at a time (OPTIMIZATION_r11.md, environment), and
    with one static range per thread the frozen thread's whole 1/T of
    the work gates the join; with small queued spans it holds at most
    one span while healthy threads drain the rest."""
    import numpy as np

    n_e = len(rcv)
    if n_e == 0:
        return [0, 0]
    n_spans = max(1, n_threads * spans_per_thread)
    cuts = [0]
    for t in range(1, n_spans):
        pos = (n_e * t) // n_spans
        # first index of the receiver run containing pos
        pos = int(np.searchsorted(rcv, rcv[pos], side="left"))
        if pos > cuts[-1]:
            cuts.append(pos)
    cuts.append(n_e)
    return cuts
