"""Windowed banded-selection maps: scatter/gather-free bonded-term plumbing.

The reference evaluates bonded terms with one fused kernel whose gathers and
force scatter-adds ride GPU shared memory (BondedUtilities,
platforms/common/src/kernels/*Force.cc). On TPU both XLA gathers (~30 ns/row)
and scatter-adds (serialized) are slow, so this module turns the static term
topology into BLOCK-BANDED 0/1 selection matrices instead:

* atoms are grouped into blocks of 64 over the active range; molecular
  topology is local, so after sorting terms by minimum atom id, the atoms of
  every term assigned to block b lie inside a (1+halo)-block window starting
  at b;
* "fwd" materializes per-term atom positions as one batched matmul of the
  static selection tensor against sliding position windows (windows built
  with the stack-of-strided-slices trick — no gathers);
* "bwd" accumulates per-slot force contributions back onto atoms with the
  transposed banded matmul — no scatters.

Both matmuls are tiny MXU work (0/1 matrices stored bf16 — exact); the
per-step cost is reading the static tensors. Terms whose atom span exceeds
the halo (disulfides across chains, etc.) fall back to a small gather +
scatter list.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 64


class WindowedTerms:
    """Static banded selection maps for T terms of k atoms each.

    idx: (T, k) int array of atom indices; n_atoms total atoms.
    Exposes:
      n_windows B, slots_per_window Wb, live (B, Wb) f32 owner mask,
      fallback_ids (Tf,) original term ids handled by gather/scatter,
      layout(arr) -> (B, Wb, ...) windowed parameter layout (numpy),
      fwd(pos) -> (B, Wb, k, 3) slot positions,
      bwd(grads (B, Wb, k, 3), n) -> (n, 3) accumulated forces.
    """

    def __init__(self, idx, n_atoms, halo=2, block=BLOCK, dtype=jnp.float32):
        idx = np.asarray(idx, np.int64).reshape(len(idx), -1)
        T, k = idx.shape
        self.k = k
        self.block = block
        self.halo = halo
        span = (idx.max(axis=1) - idx.min(axis=1)) if T else np.zeros(0)
        in_band = span <= halo * block
        self.fallback_ids = np.nonzero(~in_band)[0].astype(np.int32)
        band_ids = np.nonzero(in_band)[0]

        if len(band_ids) == 0:
            self.B = 0
            self.order = np.zeros(0, np.int32)
            return

        bidx = idx[band_ids]
        # active atom-block range
        lo_blk = int(bidx.min() // block)
        hi_blk = int(bidx.max() // block) + 1
        self.lo = lo_blk * block
        mins = bidx.min(axis=1)
        home = (mins // block - lo_blk).astype(np.int64)
        B = hi_blk - lo_blk
        counts = np.bincount(home, minlength=B)
        Wb = max(8, int(-(-int(counts.max()) // 8) * 8))
        self.B, self.Wb = B, Wb
        self.Wa = (1 + halo) * block

        # window slot assignment, ordered by home block (term order perm)
        order = np.argsort(home, kind="stable")
        self.order = band_ids[order].astype(np.int32)   # original term ids
        slot_of = np.zeros(len(band_ids), np.int64)
        off = np.zeros(B + 1, np.int64)
        np.cumsum(counts, out=off[1:])
        pos_in = np.arange(len(band_ids)) - off[home[order]]
        slot_of[order] = pos_in

        live = np.zeros((B, Wb), np.float32)
        F = np.zeros((B, Wb * k, self.Wa), np.float32)
        M = np.zeros((B, block, (halo + 1) * Wb * k), np.float32)
        h_sorted = home[order]
        s_sorted = slot_of[order]
        a_sorted = bidx[order] - self.lo
        for t in range(len(order)):
            b = int(h_sorted[t])
            j = int(s_sorted[t])
            live[b, j] = 1.0
            for r in range(k):
                a = int(a_sorted[t, r])
                F[b, j * k + r, a - b * block] = 1.0
                tb = a // block                 # atom block receiving force
                src = b - (tb - halo)           # window offset inside M
                M[tb, a - tb * block, src * Wb * k + j * k + r] = 1.0
        self.live = jnp.asarray(live)
        # f32 selections: a bf16 selection operand would make the TPU MXU
        # truncate the f32 POSITION side of the product to bf16 (~1e-2 nm
        # coordinate noise -> garbage bonded forces). The matmuls also pin
        # HIGHEST precision for the same reason.
        # NOTE: these tensors are tens of MB — callers must pass them through
        # the params pytree (jit arguments) via tensors(), NOT close over
        # them (embedded jaxpr constants blow remote-compile payload limits)
        self._F = jnp.asarray(F.astype(np.float32))
        self._M = jnp.asarray(M.astype(np.float32))
        self.dtype = dtype

    def tensors(self):
        """The large static selection tensors, to ride the params pytree."""
        if self.B == 0:
            return {}
        return {"sel_F": self._F, "sel_M": self._M}

    # ------------------------------------------------------------- helpers
    def layout(self, arr):
        """(T, ...) numpy parameter array -> (B, Wb, ...) windowed layout."""
        arr = np.asarray(arr)
        out = np.zeros((self.B, self.Wb) + arr.shape[1:], arr.dtype)
        if len(self.order) == 0:
            return out
        home = np.repeat(np.arange(self.B), self.Wb).reshape(self.B, self.Wb)
        # refill in the same order the constructor assigned slots
        k = 0
        live = np.asarray(self.live)
        for b in range(self.B):
            cnt = int(live[b].sum())
            out[b, :cnt] = arr[self.order[k:k + cnt]]
            k += cnt
        return out

    def fwd(self, pos, F=None):
        """pos (n, 3) -> slot positions (B, Wb, k, 3). Pass F from
        tensors() through params to keep it out of the traced constants."""
        if F is None:
            F = self._F
        block, halo, B = self.block, self.halo, self.B
        need = self.lo + (B + halo) * block
        padn = need - pos.shape[0]
        seg = pos[self.lo:]
        if padn > 0:
            seg = jnp.concatenate(
                [seg, jnp.zeros((padn, 3), pos.dtype)])
        segs = seg[:(B + halo) * block].reshape(B + halo, block, 3)
        wins = jnp.concatenate(
            [segs[i:i + B] for i in range(halo + 1)], axis=1)  # (B, Wa, 3)
        # contract with xyz on the SUBLANE side: an (…, Wa) x (Wa, 3)
        # product leaves the MXU's 128 output lanes 3/128 occupied (measured
        # 0.63 ms for the DHFR torsions alone); (3, Wa) x (Wa, Wbk) puts the
        # 3 on the 8-deep sublane axis instead and the wide Wbk dimension on
        # the lanes — the final (B, 3, Wbk) -> (B, Wbk, 3) relayout is ~MBs
        slots_t = jax.lax.dot_general(
            wins.astype(jnp.float32), F,
            (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # (B, 3, Wbk)
        slots = slots_t.transpose(0, 2, 1)                     # (B, Wbk, 3)
        return slots.reshape(B, self.Wb, self.k, 3)

    def bwd(self, grads, n, M=None):
        """grads (B, Wb, k, 3) d(energy)/d(slot pos) -> (n, 3) forces=-grad."""
        if M is None:
            M = self._M
        block, halo, B, Wb, k = self.block, self.halo, self.B, self.Wb, self.k
        g = grads.reshape(B, Wb * k, 3)
        gp = jnp.concatenate(
            [jnp.zeros((halo, Wb * k, 3), g.dtype), g], axis=0)
        swins = jnp.concatenate(
            [gp[i:i + B] for i in range(halo + 1)], axis=1)  # (B,(h+1)Wbk,3)
        # same lane-utilization trick as fwd: keep xyz on the sublane axis
        f_t = jax.lax.dot_general(
            swins.astype(jnp.float32), M,
            (((1,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)             # (B, 3, block)
        f = f_t.transpose(0, 2, 1).reshape(B * block, 3)
        out = jnp.zeros((n, 3), f.dtype)
        hi = min(self.lo + B * block, n)
        out = jnp.concatenate(
            [out[:self.lo], f[:hi - self.lo], out[hi:]])
        return out
