"""Paged KV-cache manager: the only stateful object in the serving stack.

The reference is stateless (SURVEY.md section 5: "Checkpoint/resume: none
(stateless kernels)"); the KV cache is the state the north star adds.  Layout
follows the decode kernel (``ops/decode.py``): a *head-major* physical page
pool per layer ``(L, num_pages, KVH, page_size, d)`` in HBM — one page spans
all KV heads, which is what lets the decode kernel fetch a whole page per
pipeline step and run at HBM speed of light — with one *logical page table
shared by all layers* (vLLM-style), so a request's page list indexes every
layer's pool identically.

Page bookkeeping runs through the native allocator
(:mod:`flashattention_tpu.runtime.native`); device writes are jitted scatters
with out-of-range padding rows dropped (``mode="drop"``), keeping per-step
compilation stable across ragged token counts via bucketed padding.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from flashattention_tpu.runtime.native import PageAllocator

__all__ = ["CacheConfig", "PagedKVCache"]


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    num_layers: int
    num_kv_heads: int
    head_dim: int
    page_size: int = 256  # TPU sweet spot: 256-token all-head pages put the
    #   decode kernel at ~92% of HBM peak on v5e (128: ~75%); the coarser
    #   allocation granularity costs ~page_size/2 tokens of padding per seq
    num_pages: int = 1024
    dtype: str = "bfloat16"  # payload dtype: bfloat16 | float32 | int8 | fp8

    @property
    def quantized(self) -> bool:
        return self.dtype in ("int8", "fp8")

    @property
    def payload_dtype(self):
        return {
            "bfloat16": jnp.bfloat16,
            "float32": jnp.float32,
            "int8": jnp.int8,
            "fp8": jnp.float8_e4m3fn,
        }[self.dtype]


@dataclasses.dataclass
class _Seq:
    length: int
    pages: list


def _bucket(n: int, lo: int = 1) -> int:
    """Round counts up to a power of two >= lo (bounds jit recompiles)."""
    b = lo
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(pages, rows, page_ids, slot_ids):
    """pages: (L, P, KVH, ps, d); rows: (L, T, KVH, d) -> scatter at
    [:, page_ids[t], :, slot_ids[t], :]; OOB page_ids are dropped (padding).

    Advanced-indexing note: the (T,) page/slot index arrays are separated by
    the KVH slice, so the broadcast axis lands at the *front*: values must be
    (T, L, KVH, d)."""
    rows = jnp.moveaxis(rows, 1, 0).astype(pages.dtype)  # (T, L, KVH, d)
    return pages.at[:, page_ids, :, slot_ids, :].set(rows, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_scales(scales, rows, page_ids, slot_ids):
    """scales: (L, P, KVH, ps); rows: (L, T, KVH) -> values (T, L, KVH)."""
    rows = jnp.moveaxis(rows, 1, 0)  # (T, L, KVH)
    return scales.at[:, page_ids, :, slot_ids].set(rows, mode="drop")


@functools.partial(jax.jit, static_argnames=("qmax", "qdtype"))
def _quantize_rows(k, v, qmax, qdtype):
    """Per-token absmax quantization of (L, T, KVH, d) rows."""

    def one(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scales = jnp.where(absmax == 0.0, 1.0, absmax / qmax)
        payload = x.astype(jnp.float32) / scales[..., None]
        if qdtype == "int8":
            payload = jnp.clip(jnp.round(payload), -qmax, qmax).astype(jnp.int8)
        else:
            payload = payload.astype(jnp.float8_e4m3fn)
        return payload, scales

    kp, ks = one(k)
    vp, vs = one(v)
    return kp, ks, vp, vs


class PagedKVCache:
    """Physical page pools + per-sequence page tables + allocator."""

    def __init__(self, config: CacheConfig):
        self.config = config
        c = config
        # Head-major pages: one page spans all KV heads (see module docstring).
        shape = (c.num_layers, c.num_pages, c.num_kv_heads, c.page_size, c.head_dim)
        self.k_pages = jnp.zeros(shape, c.payload_dtype)
        self.v_pages = jnp.zeros(shape, c.payload_dtype)
        if c.quantized:
            sshape = shape[:-1]
            self.k_scales = jnp.ones(sshape, jnp.float32)
            self.v_scales = jnp.ones(sshape, jnp.float32)
        else:
            self.k_scales = self.v_scales = None
        self.allocator = PageAllocator(c.num_pages)
        self._seqs: dict[int, _Seq] = {}
        # Prefix caching (round 2): full prompt pages are content-addressed
        # by a chain hash (key_i = hash(key_{i-1}, tokens of page i)) so
        # concurrent requests sharing a prompt prefix share physical pages.
        # Only FULL pages are ever shared — partial pages stay private, so
        # shared pages are immutable and no copy-on-write is needed.
        self._refs: dict[int, int] = {}  # page -> refcount (absent == 1-owner)
        self._prefix_index: dict[tuple, int] = {}  # chain key -> page
        self._page_keys: dict[int, list] = {}  # page -> keys it backs
        # Prefix-cache persistence (round 3): prefix-indexed pages whose last
        # owner released them are PARKED here (insertion order == LRU order)
        # instead of returning to the allocator — their content and index
        # entries survive, so a later request with the same prompt still hits.
        # They are reclaimed lazily: allocation evicts from the LRU head only
        # when the allocator proper runs dry, so cache persistence never
        # reduces usable capacity.
        self._cached_free: dict[int, None] = {}

    # ── sequence lifecycle ────────────────────────────────────────────────

    def has(self, seq_id: int) -> bool:
        return seq_id in self._seqs

    def length(self, seq_id: int) -> int:
        return self._seqs[seq_id].length

    def pages(self, seq_id: int) -> list:
        return list(self._seqs[seq_id].pages)

    def num_free_pages(self) -> int:
        # Parked prefix pages are reclaimable on demand: count them.
        return self.allocator.num_free() + len(self._cached_free)

    def can_append(self, seq_id: int, num_tokens: int) -> bool:
        need = self._pages_needed(seq_id, num_tokens)
        return need <= self.num_free_pages()

    def _pages_needed(self, seq_id: int, num_tokens: int) -> int:
        cur = self._seqs[seq_id].length if seq_id in self._seqs else 0
        ps = self.config.page_size
        return -(-(cur + num_tokens) // ps) - (-(-cur // ps))

    def free_sequence(self, seq_id: int) -> None:
        seq = self._seqs.pop(seq_id, None)
        if seq is not None:
            self._release(seq.pages)

    # ── prefix caching ────────────────────────────────────────────────────

    def _release(self, pages: list) -> None:
        """Decref-aware free: a page leaves its last owner either parked in
        the prefix LRU (if it backs prefix-index entries — persistence) or
        back in the allocator; parked pages keep their index entries."""
        really_free = []
        for pg in pages:
            n = self._refs.get(pg, 1) - 1
            if n > 0:
                self._refs[pg] = n
                continue
            self._refs.pop(pg, None)
            if pg in self._page_keys:
                self._cached_free[pg] = None  # park at LRU tail
                continue
            really_free.append(pg)
        if really_free:
            self.allocator.free(really_free)

    def _drop_cached(self, pg: int) -> None:
        """Forget a parked page's cache identity (index entries + LRU slot)."""
        del self._cached_free[pg]
        for key in self._page_keys.pop(pg, ()):
            if self._prefix_index.get(key) == pg:
                del self._prefix_index[key]

    def _alloc(self, need: int) -> list | None:
        """Allocate, evicting LRU parked prefix pages only when the allocator
        proper can't satisfy the request."""
        short = need - self.allocator.num_free()
        if short > 0:
            if short > len(self._cached_free):
                return None
            victims = list(self._cached_free)[:short]
            for pg in victims:
                self._drop_cached(pg)
            self.allocator.free(victims)
        return self.allocator.alloc(need)

    @staticmethod
    def _chain_keys(tokens, page_size):
        """SHA-256 chain digest per FULL page of ``tokens``.

        A cryptographic chain (digest_i = H(digest_{i-1} || page_i tokens))
        makes collisions negligible, so a digest match IS a content match —
        Python's unkeyed ``hash()`` would let two different prompts silently
        share pages on a collision (round-2 review finding)."""
        import hashlib

        keys, prev = [], b""
        for i in range(len(tokens) // page_size):
            h = hashlib.sha256(prev)
            h.update(
                b"".join(
                    int(t).to_bytes(8, "little", signed=True)
                    for t in tokens[i * page_size : (i + 1) * page_size]
                )
            )
            prev = h.digest()
            keys.append(prev)
        return keys

    def match_prefix(self, tokens) -> tuple[int, list]:
        """Longest shared full-page prefix of ``tokens`` already resident.

        Returns (n_tokens, page_ids); n_tokens is a page multiple and at
        most len(tokens) - 1 (at least one token must remain to prefill, so
        the request produces logits)."""
        ps = self.config.page_size
        n, pages = 0, []
        for key in self._chain_keys(tokens, ps):
            pg = self._prefix_index.get(key)
            if pg is None or n + ps > len(tokens) - 1:
                break
            pages.append(pg)
            n += ps
        return n, pages

    def adopt_prefix(self, seq_id: int, pages: list, n_tokens: int) -> None:
        """Start ``seq_id`` sharing ``pages`` (refcounted) as its first
        ``n_tokens`` (a page multiple) of context."""
        if seq_id in self._seqs:
            raise ValueError(f"sequence {seq_id} already exists")
        for pg in pages:
            if pg in self._cached_free:
                # Revive a parked page: this adopter becomes its sole owner
                # (absent refcount == 1-owner), index entries stay live.
                del self._cached_free[pg]
            else:
                self._refs[pg] = self._refs.get(pg, 1) + 1
        self._seqs[seq_id] = _Seq(n_tokens, list(pages))

    def register_prefix(self, seq_id: int, tokens) -> None:
        """Publish ``seq_id``'s full prompt pages into the prefix index so
        later requests with the same prefix share them."""
        seq = self._seqs.get(seq_id)
        if seq is None:
            return
        ps = self.config.page_size
        for i, key in enumerate(self._chain_keys(tokens, ps)):
            if i >= len(seq.pages) or (i + 1) * ps > seq.length:
                break
            if key not in self._prefix_index:
                pg = seq.pages[i]
                self._prefix_index[key] = pg
                self._page_keys.setdefault(pg, []).append(key)

    # ── writes ────────────────────────────────────────────────────────────

    def append(self, seq_id: int, k: jax.Array, v: jax.Array) -> None:
        """Append T tokens of K/V for one sequence.

        k, v: (L, T, KVH, d) in any float dtype; quantized on the fly when the
        cache stores int8/fp8.  Raises MemoryError when out of pages.
        """
        c = self.config
        l, t, kvh, d = k.shape
        assert (l, kvh, d) == (c.num_layers, c.num_kv_heads, c.head_dim), (
            k.shape,
            c,
        )
        seq = self._seqs.setdefault(seq_id, _Seq(0, []))
        need = self._pages_needed(seq_id, t)
        if need:
            got = self._alloc(need)
            if got is None:
                raise MemoryError(
                    f"KV cache out of pages: need {need}, free {self.num_free_pages()}"
                )
            seq.pages.extend(got)

        ps = c.page_size
        positions = [seq.length + i for i in range(t)]
        page_ids = [seq.pages[p // ps] for p in positions]
        slot_ids = [p % ps for p in positions]
        # Pad to a bucket size; padded rows get page_id == num_pages (dropped).
        tb = _bucket(t)
        page_ids += [c.num_pages] * (tb - t)
        slot_ids += [0] * (tb - t)
        kb = jnp.pad(k, ((0, 0), (0, tb - t), (0, 0), (0, 0)))
        vb = jnp.pad(v, ((0, 0), (0, tb - t), (0, 0), (0, 0)))
        page_arr = jnp.asarray(page_ids, jnp.int32)
        slot_arr = jnp.asarray(slot_ids, jnp.int32)

        if c.quantized:
            qmax = 127.0 if c.dtype == "int8" else 448.0
            kp, ks, vp, vs = _quantize_rows(kb, vb, qmax, c.dtype)
            self.k_pages = _write_rows(self.k_pages, kp, page_arr, slot_arr)
            self.v_pages = _write_rows(self.v_pages, vp, page_arr, slot_arr)
            self.k_scales = _write_scales(self.k_scales, ks, page_arr, slot_arr)
            self.v_scales = _write_scales(self.v_scales, vs, page_arr, slot_arr)
        else:
            self.k_pages = _write_rows(self.k_pages, kb, page_arr, slot_arr)
            self.v_pages = _write_rows(self.v_pages, vb, page_arr, slot_arr)
        seq.length += t

    def trim(self, seq_id: int, new_length: int) -> None:
        """Shrink a sequence to ``new_length`` tokens, freeing whole pages
        past the new end (chunked prefill over-reserves to its chunk multiple
        and trims back to the true prompt length)."""
        seq = self._seqs[seq_id]
        if new_length > seq.length:
            raise ValueError(f"trim to {new_length} > current {seq.length}")
        ps = self.config.page_size
        keep = -(-new_length // ps)
        if len(seq.pages) > keep:
            self._release(seq.pages[keep:])
            seq.pages = seq.pages[:keep]
        seq.length = new_length

    def reserve_slot(self, seq_id: int) -> tuple[int, int]:
        """Reserve the (page, slot) for one new token and bump the length.

        Used by the decode path, where the K/V rows are scattered into the
        pools *inside* the jitted step (models.transformer.decode_step); the
        host only does the page bookkeeping.  Raises MemoryError on OOM.
        """
        c = self.config
        seq = self._seqs.setdefault(seq_id, _Seq(0, []))
        if seq.length == len(seq.pages) * c.page_size:
            got = self._alloc(1)
            if got is None:
                raise MemoryError("KV cache out of pages")
            seq.pages.extend(got)
        page = seq.pages[seq.length // c.page_size]
        slot = seq.length % c.page_size
        seq.length += 1
        return page, slot

    def set_pools(self, k_pages, v_pages, k_scales=None, v_scales=None) -> None:
        """Install updated pools returned by a donated jitted step."""
        self.k_pages = k_pages
        self.v_pages = v_pages
        if k_scales is not None:
            self.k_scales = k_scales
        if v_scales is not None:
            self.v_scales = v_scales

    # ── reads ─────────────────────────────────────────────────────────────

    def batch_view(self, seq_ids: list[int], pages_per_seq: int):
        """(lengths, page_indices) tensors for a decode batch.

        Unknown/finished seq ids get length 0 and page row 0 (callers mask).
        """
        lengths, table = [], []
        for sid in seq_ids:
            seq = self._seqs.get(sid)
            if seq is None:
                lengths.append(0)
                table.append([0] * pages_per_seq)
                continue
            if len(seq.pages) > pages_per_seq:
                raise ValueError(
                    f"sequence {sid} uses {len(seq.pages)} pages > view "
                    f"pages_per_seq={pages_per_seq}"
                )
            lengths.append(seq.length)
            table.append(seq.pages + [0] * (pages_per_seq - len(seq.pages)))
        return (
            jnp.asarray(lengths, jnp.int32),
            jnp.asarray(table, jnp.int32),
        )

    def layer_pages(self, layer: int):
        """(k_pages, v_pages, k_scales, v_scales) for ops.decode.paged_attention."""
        if self.config.quantized:
            return (
                self.k_pages[layer],
                self.v_pages[layer],
                self.k_scales[layer],
                self.v_scales[layer],
            )
        return self.k_pages[layer], self.v_pages[layer], None, None
