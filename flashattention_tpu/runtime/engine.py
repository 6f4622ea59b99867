"""Continuous-batching inference engine.

The serving loop of the north star (BASELINE.json: "continuous batching of
decode requests"): requests arrive at any time; the engine admits them FCFS
through the native scheduler when batch slots + KV pages are available,
prefills their prompts with the causal flash kernel, then advances *all*
running requests one token per :meth:`Engine.step` with the batched paged
decode kernel.  Finished requests free their pages immediately, letting
waiting requests admit on the next step — the defining continuous-batching
behavior (no static batch barriers).

JIT stability: the decode batch is padded to ``max_batch`` and prompts pad to
power-of-two buckets, so steady-state decode compiles a handful of programs.
Chunked prefill passes a fixed-capacity (power-of-two-bucketed) page table
with the live context length as a traced scalar-prefetch value, so it
compiles one program per capacity bucket — O(log max_len), independent of
the number of chunks (round 2; previously one program per chunk index).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from flashattention_tpu.models import transformer
from flashattention_tpu.ops import sampling
from flashattention_tpu.runtime.kvcache import CacheConfig, PagedKVCache
from flashattention_tpu.runtime.kvcache import _bucket as kv_bucket
from flashattention_tpu.runtime.native import Scheduler

__all__ = ["EngineConfig", "SamplingParams", "Request", "Engine"]


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_batch: int = 8
    pages_per_seq: int = 16  # max pages (=> max length) per request
    prefill_chunk: int = 512  # chunked prefill above this prompt length
    #   (0 disables; must be a multiple of the cache page_size)
    greedy: bool = True  # False: temperature sampling (see Engine.sample_key)
    temperature: float = 1.0
    top_k: int | None = None  # keep only the k highest-probability tokens
    top_p: float | None = None  # nucleus sampling: smallest set with mass >= p
    eos_token: int | None = None

    def __post_init__(self):
        if not self.greedy and not self.temperature > 0.0:
            raise ValueError(
                f"temperature must be > 0 for sampling (got {self.temperature})"
            )
        if self.top_k is not None and self.top_k < 1:
            raise ValueError(f"top_k must be >= 1 (got {self.top_k})")
        if self.top_p is not None and not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1] (got {self.top_p})")


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling / stop configuration (round 3).

    ``None`` on a request means "use the engine defaults" (EngineConfig).
    ``seed`` gives the request its OWN key stream, folded per emitted-token
    position — its continuation is bitwise reproducible regardless of what
    other requests share the batch (batch-composition independence, the
    property production serving needs for replayable requests).
    ``stop_tokens`` finish the request on any single-token match (the eos
    mechanism, generalized); ``stop_sequences`` finish it when the tail of
    the generated output matches any of the token tuples (the matched
    sequence stays in the output).  ``logprobs`` records the raw model
    log-softmax of each emitted token in ``Request.logprobs``.
    """

    greedy: bool = True
    temperature: float = 1.0
    top_k: int | None = None
    top_p: float | None = None
    seed: int | None = None
    eos_token: int | None = None
    stop_tokens: tuple = ()
    stop_sequences: tuple = ()  # tuple of token tuples
    logprobs: bool = False

    def __post_init__(self):
        if not self.greedy and not self.temperature > 0.0:
            raise ValueError(
                f"temperature must be > 0 for sampling (got {self.temperature})"
            )
        if self.top_k is not None and self.top_k < 1:
            raise ValueError(f"top_k must be >= 1 (got {self.top_k})")
        if self.top_p is not None and not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1] (got {self.top_p})")
        for s in self.stop_sequences:
            if not len(s):
                raise ValueError("stop_sequences entries must be non-empty")

    @property
    def filter_key(self):
        """Rows with equal filter_key can share one batched sampling call."""
        return (self.greedy, self.temperature, self.top_k, self.top_p)


@dataclasses.dataclass
class Request:
    req_id: int
    prompt: list
    max_new_tokens: int
    output: list = dataclasses.field(default_factory=list)
    state: str = "waiting"  # waiting | running | finished | cancelled
    sampling: SamplingParams | None = None  # None -> engine defaults
    logprobs: list = dataclasses.field(default_factory=list)
    on_token: object = None  # callable(req, token) or None; not checkpointed

    @property
    def length(self) -> int:
        return len(self.prompt) + len(self.output)


def _bucket(n: int) -> int:
    return kv_bucket(n, lo=8)


# Temperature + top-k + top-p sampling; shared with the jitted decode loop
# and the sampled speculative accept (ops/sampling.py, round 3; VERDICT #8).
_sample_logits = jax.jit(
    sampling.sample_logits, static_argnames=("temperature", "top_k", "top_p")
)


class Engine:
    def __init__(
        self,
        params,
        model_cfg: transformer.ModelConfig,
        cache_cfg: CacheConfig,
        engine_cfg: EngineConfig = EngineConfig(),
        *,
        interpret: bool | None = None,
    ):
        self.params = params
        self.model_cfg = model_cfg
        self.cache = PagedKVCache(cache_cfg)
        self.cfg = engine_cfg
        if engine_cfg.prefill_chunk and engine_cfg.prefill_chunk % cache_cfg.page_size:
            raise ValueError(
                f"prefill_chunk ({engine_cfg.prefill_chunk}) must be a "
                f"multiple of page_size ({cache_cfg.page_size})"
            )
        self.scheduler = Scheduler(engine_cfg.max_batch, cache_cfg.page_size)
        self.requests: dict[int, Request] = {}
        self.running: list[int] = []  # req ids in batch-slot order
        self._next_id = 0
        self._interpret = interpret
        self._last_admitted = 0
        self.sample_key = jax.random.key(0)  # used when not cfg.greedy
        self.on_token = None  # engine-wide streaming hook f(request, token)
        # Engine-default per-request params (requests with sampling=None).
        self._default_sampling = SamplingParams(
            greedy=engine_cfg.greedy,
            temperature=engine_cfg.temperature,
            top_k=engine_cfg.top_k,
            top_p=engine_cfg.top_p,
            eos_token=engine_cfg.eos_token,
        )
        # Serving counters (observability; see stats()).
        self._n_steps = 0
        self._n_decode_tokens = 0
        self._n_prefill_tokens = 0
        self._n_preemptions = 0

    # ── public API ────────────────────────────────────────────────────────

    def add_request(
        self,
        prompt,
        max_new_tokens: int,
        *,
        sampling: SamplingParams | None = None,
        on_token=None,
    ) -> int:
        """Queue a request.

        ``sampling``: per-request :class:`SamplingParams` (None = engine
        defaults).  ``on_token``: streaming callback ``f(request, token)``
        invoked synchronously as each token is emitted (after the request's
        state/output are updated, so ``request.state == "finished"`` on the
        final call); engine-level ``Engine.on_token`` fires too if set.
        """
        # Fail fast on requests that could never complete: the total span must
        # fit both the per-request page-table view and the physical pool
        # (otherwise batch_view / the allocator would blow up mid-serve and
        # take every in-flight request down with them).
        span = len(prompt) + max_new_tokens
        ps = self.cache.config.page_size
        need = -(-span // ps)
        # (Chunked prefill reserves pages for REAL tokens only — pad tokens
        # scatter to the dropped trash index, round 3 — so the span bound
        # already covers the prefill peak.)
        cap = min(self.cfg.pages_per_seq, self.cache.config.num_pages)
        if need > cap:
            raise ValueError(
                f"request needs {need} pages ({span} tokens @ page_size {ps}) "
                f"but the engine caps at {cap} "
                f"(pages_per_seq={self.cfg.pages_per_seq}, "
                f"num_pages={self.cache.config.num_pages})"
            )
        req_id = self._next_id
        self._next_id += 1
        self.requests[req_id] = Request(
            req_id, list(prompt), max_new_tokens,
            sampling=sampling, on_token=on_token,
        )
        self.scheduler.add_request(req_id, len(prompt), max_new_tokens)
        return req_id

    def has_work(self) -> bool:
        return bool(self.running) or self.scheduler.num_waiting() > 0

    def cancel(self, req_id: int) -> bool:
        """Abort a request wherever it sits (round 3).

        Waiting requests leave the admission queue; running ones drop out of
        the decode batch and their pages free immediately (prefix-registered
        full pages park in the reclaimable LRU like any finished request's).
        Tokens generated so far stay in ``requests[req_id].output``.  Returns
        False for unknown / already-finished / already-cancelled ids — cancel
        races request completion, so that outcome is an answer, not an error.
        """
        req = self.requests.get(req_id)
        if req is None or req.state in ("finished", "cancelled"):
            return False
        self.scheduler.cancel(req_id)
        if req_id in self.running:
            self.running.remove(req_id)
        if self.cache.has(req_id):
            self.cache.free_sequence(req_id)
        req.state = "cancelled"
        return True

    def run(self, max_steps: int = 10_000, multi_step: int = 1) -> dict[int, list]:
        """Drive steps until all requests finish; returns outputs by id.

        ``multi_step > 1``: when no requests are waiting, the engine decodes
        up to that many tokens per step in ONE device call
        (:func:`transformer.decode_loop`) — multi-token scheduling, which
        amortizes all host work and (on tunneled/remote TPUs) the dispatch
        round trip over N tokens.  Non-greedy configs thread the engine's
        PRNG key through the loop (same key stream as per-token sampling;
        round 3, VERDICT #8).  eos/budget semantics are unchanged:
        surplus tokens past a request's stop are discarded and their cache
        slots freed.  Falls back to per-token stepping whenever a request
        could not absorb the full span (page pressure, short budget) or
        admission work is pending.
        """
        for _ in range(max_steps):
            if not self.has_work():
                break
            was_empty = not self.running
            self.step(multi_step=multi_step)
            if (
                was_empty
                and self._last_admitted == 0
                and self.scheduler.num_waiting() > 0
            ):
                # A step that began with an empty batch admitted nothing: the
                # waiting requests can never fit (admission deadlock) — bail
                # instead of spinning max_steps no-op iterations.
                raise RuntimeError(
                    f"{self.scheduler.num_waiting()} waiting request(s) "
                    "cannot be admitted (insufficient free pages even with "
                    "an empty batch)"
                )
        return {rid: r.output for rid, r in self.requests.items()}

    # ── checkpoint / resume ───────────────────────────────────────────────

    def state_dict(self) -> dict:
        """Snapshot of serving state for checkpoint/resume.

        Recompute-style (the only state the reference-scope stack truly owns
        is the token ids; KV pages are derived): each request's prompt,
        generated output, and budget.  On restore, unfinished requests
        re-queue and their context re-prefills on admission — the same
        recovery path preemption uses — so pools/allocator/scheduler internals
        never need serializing.  (SURVEY.md section 5: KV cache is the only
        state; metadata snapshot, orbax optional.)
        """
        return {
            "next_id": self._next_id,
            # Raw PRNG key bits: restoring makes non-greedy resume sample the
            # same continuation a never-checkpointed engine would have.
            "sample_key": np.asarray(jax.random.key_data(self.sample_key))
            .tolist(),
            "requests": [
                {
                    "req_id": r.req_id,
                    "prompt": list(r.prompt),
                    "max_new_tokens": r.max_new_tokens,
                    "output": list(r.output),
                    "state": r.state,
                    # Per-request sampling params travel with the request
                    # (seeded streams resume bitwise: the key is re-derived
                    # from (seed, position), never stored).  on_token
                    # callbacks are process-local and do NOT survive resume.
                    "sampling": (
                        dataclasses.asdict(r.sampling)
                        if r.sampling is not None
                        else None
                    ),
                    "logprobs": list(r.logprobs),
                }
                for r in self.requests.values()
            ],
        }

    @classmethod
    def from_state(
        cls, state: dict, params, model_cfg, cache_cfg, engine_cfg=None, **kw
    ) -> "Engine":
        """Rebuild an engine from :meth:`state_dict` (fresh pools; unfinished
        requests re-queue with their full generated context re-prefilled)."""
        eng = cls(params, model_cfg, cache_cfg, engine_cfg or EngineConfig(), **kw)
        eng._next_id = state["next_id"]
        if "sample_key" in state:
            eng.sample_key = jax.random.wrap_key_data(
                jnp.asarray(state["sample_key"], dtype=jnp.uint32)
            )
        for r in state["requests"]:
            sp = r.get("sampling")
            if sp is not None:
                sp = SamplingParams(**{
                    **sp,
                    # JSON round-trips tuples as lists; normalize back.
                    "stop_tokens": tuple(sp.get("stop_tokens", ())),
                    "stop_sequences": tuple(
                        tuple(s) for s in sp.get("stop_sequences", ())
                    ),
                })
            req = Request(
                r["req_id"], list(r["prompt"]), r["max_new_tokens"],
                output=list(r["output"]), state=r["state"],
                sampling=sp, logprobs=list(r.get("logprobs", ())),
            )
            eng.requests[req.req_id] = req
            if req.state in ("finished", "cancelled"):
                continue
            # waiting OR running: re-queue; prefill recomputes the KV context
            # (prompt + generated so far) when the scheduler re-admits it.
            req.state = "waiting"
            eng.scheduler.add_request(
                req.req_id, req.length, req.max_new_tokens - len(req.output)
            )
        return eng

    # ── engine step ───────────────────────────────────────────────────────

    def step(self, multi_step: int = 1) -> None:
        """Admit + prefill new requests, then decode token(s) for all."""
        self._n_steps += 1
        self._admit_and_prefill()
        if not self.running:
            return
        if (
            multi_step > 1
            and self.scheduler.num_waiting() == 0
            and self._decode_batch_many(multi_step)
        ):
            return
        self._decode_batch()

    def stats(self) -> dict:
        """Serving counters: steps, tokens in/out, preemptions, occupancy."""
        return {
            "steps": self._n_steps,
            "prefill_tokens": self._n_prefill_tokens,
            "decode_tokens": self._n_decode_tokens,
            "preemptions": self._n_preemptions,
            "running": len(self.running),
            "waiting": self.scheduler.num_waiting(),
            "free_pages": self.cache.num_free_pages(),
        }

    def _admit_and_prefill(self) -> None:
        admitted = self.scheduler.admit(self.cache.num_free_pages())
        self._last_admitted = len(admitted)
        chunk = self.cfg.prefill_chunk
        short: dict[int, list[Request]] = {}  # bucketed-length -> requests
        longs: list[Request] = []
        for req_id in admitted:
            req = self.requests[req_id]
            req.state = "running"
            self.running.append(req_id)
            toks = req.prompt + req.output
            shared = 0
            if chunk:
                # Adopt any resident shared prefix IMMEDIATELY (refcounted):
                # matching now and adopting later would race preemptions
                # freeing the matched pages mid-step, and hashing once here
                # avoids recomputing the chain in the prefill path.
                n_sh, pages_sh = self.cache.match_prefix(toks)
                if n_sh:
                    self.cache.adopt_prefix(req_id, pages_sh, n_sh)
                    shared = n_sh
            if chunk and (req.length > chunk or shared):
                longs.append(req)
            else:
                short.setdefault(_bucket(req.length), []).append(req)
        # Short prompts batch by padded-length bucket: one jitted prefill per
        # group instead of one dispatch per request.  They run BEFORE the
        # chunked prompts: a chunked prefill may preempt under page pressure,
        # and only requests whose KV state exists can be safely evicted (a
        # same-step admittee still waiting in `short` must not be).
        for sb, group in sorted(short.items()):
            self._prefill_batch(group, sb)
        if longs:
            self._prefill_chunked_many(
                [r for r in longs if r.req_id in self.running]
            )

    def _prefill(self, req: Request) -> None:
        # Re-prefills after preemption include already-generated tokens
        # (recompute-style preemption: the context is re-embedded, no state
        # beyond the token ids survives eviction).
        prompt = np.asarray(req.prompt + req.output, np.int32)
        s = len(prompt)
        chunk = self.cfg.prefill_chunk
        if chunk and (
            s > chunk or self.cache.match_prefix(prompt.tolist())[0] > 0
        ):
            self._prefill_chunked_many([req])
            return
        self._prefill_batch([req], _bucket(s))

    def _prefill_batch(self, reqs: list, sb: int) -> None:
        """Prefill a group of requests together, padded to the (sb) bucket.

        Pad tokens sit at each row's tail: valid rows never attend them under
        the causal mask, their K/V rows are never cached, and the batch dim
        pads to a power of two to bound jit recompiles."""
        n = len(reqs)
        nb = kv_bucket(n)  # power-of-two batch pad from 1 (not the length
        #   bucket's lo=8 — that would 4x the prefill FLOPs for small groups)
        toks = np.zeros((nb, sb), np.int32)
        lens = []
        for i, req in enumerate(reqs):
            p = req.prompt + req.output
            toks[i, : len(p)] = p
            lens.append(len(p))
        logits, k_rows, v_rows = transformer.prefill(
            self.params, jnp.asarray(toks), cfg=self.model_cfg,
            interpret=self._interpret,
        )
        # Cache rows for each real prompt only:
        # (L, NB, Sb, KVH, d) -> per-request (L, S_i, KVH, d)
        self._n_prefill_tokens += sum(lens)
        for i, req in enumerate(reqs):
            s = lens[i]
            self.cache.append(req.req_id, k_rows[:, i, :s], v_rows[:, i, :s])
            if self.cfg.prefill_chunk:  # prefix caching rides the chunk path
                self.cache.register_prefix(
                    req.req_id, req.prompt + req.output
                )
            first, lp = self._sample_one(req, logits[i, s - 1])
            self._emit(req, first, lp)

    def _reserve_or_preempt(self, rid: int) -> tuple[int, int]:
        while True:
            try:
                return self.cache.reserve_slot(rid)
            except MemoryError:
                if not self._preempt(exclude=rid):
                    raise

    def _prefill_chunked_many(self, reqs: list) -> None:
        """Chunked prefill for one OR MANY long prompts, batched per chunk
        step (round 3).

        Each request's prompt is processed in ``prefill_chunk``-token chunks
        against the paged cache; every lockstep chunk round dispatches ONE
        ``transformer.prefill_chunk_batched`` call covering all still-live
        requests (batch padded to a power-of-two bucket with ``ctx=0`` dummy
        rows).  On a tunneled host that divides the per-chunk round-trip by
        the batch size; on-device the shared (B*T, d_model) GEMMs and the
        batched paged-attention grid keep small chunks out of pipeline
        ramp-up.  The final stage of the batched model fn is arranged so a
        row's logits are BITWISE what the single-request dispatch produces —
        batching is a pure scheduling decision, invisible to goldens.

        Requests finish at different rounds (ragged chunk counts); a request
        preempted mid-flight (page pressure from a peer's reservation) drops
        out of subsequent rounds and restarts from scratch on re-admission.
        The last chunk of each request is padded to the chunk size; pad
        tokens scatter to the out-of-range trash page index (``mode="drop"``
        discards them) and reserve no slots, so padding never holds real
        pages hostage.  Activation memory stays O(B * chunk * context) and
        every chunk boundary is a scheduling point."""
        c = self.cache.config
        chunk = self.cfg.prefill_chunk
        quant = c.quantized
        states = []
        for req in reqs:
            rid = req.req_id
            if rid not in self.running:
                continue
            prompt = np.asarray(req.prompt + req.output, np.int32)
            s = len(prompt)
            # Prefix caching: adopt any resident full-page prefix (refcounted
            # shared pages; match guarantees >= 1 token remains to prefill)
            # and compute only the remainder against that adopted context.
            if self.cache.has(rid):
                skip = self.cache.length(rid)  # prefix adopted at admission
            else:
                skip = 0
                n_shared, shared_pages = self.cache.match_prefix(
                    prompt.tolist()
                )
                if n_shared:
                    self.cache.adopt_prefix(rid, shared_pages, n_shared)
                    skip = n_shared
            rem = s - skip
            padded = -(-rem // chunk) * chunk
            states.append({
                "req": req, "rid": rid, "prompt": prompt, "s": s,
                "skip": skip, "rem": rem, "padded": padded,
                "toks": np.pad(prompt[skip:], (0, padded - rem)),
                "start": 0, "logits": None,
            })
        while True:
            live = [
                st for st in states
                if st["start"] < st["padded"] and st["rid"] in self.running
            ]
            if not live:
                break
            # Reserve this round's slots for every live request FIRST: a
            # reservation may preempt a peer (page pressure), so membership
            # is re-checked before building the dispatch.
            reserved = {}
            for st in live:
                if st["rid"] not in self.running:
                    continue  # preempted by an earlier peer's reservation
                pages, slots = [], []
                base = st["skip"] + st["start"]
                for t in range(chunk):
                    if base + t < st["s"]:
                        pg, sl = self._reserve_or_preempt(st["rid"])
                    else:
                        # Pad token: out-of-range page index, dropped scatter.
                        pg, sl = c.num_pages, 0
                    pages.append(pg)
                    slots.append(sl)
                reserved[st["rid"]] = (pages, slots)
            live = [st for st in live if st["rid"] in self.running]
            if not live:
                continue
            # Fixed-capacity tables: one shared power-of-two page count (the
            # max over the batch) so the jitted program is shared across
            # chunk indices and batch compositions; pad entries are read-only
            # garbage the kernel's causal anchor never reaches.
            cap = max(
                kv_bucket((st["skip"] + st["start"] + chunk) // c.page_size)
                for st in live
            )
            nb = kv_bucket(len(live))  # power-of-two batch bucket from 1
            tokens = np.zeros((nb, chunk), np.int32)
            positions = np.zeros((nb, chunk), np.int32)
            tables = np.zeros((nb, cap), np.int32)
            wpages = np.full((nb, chunk), c.num_pages, np.int32)
            wslots = np.zeros((nb, chunk), np.int32)
            ctxs = np.zeros((nb,), np.int32)  # dummy rows: ctx = 0
            for i, st in enumerate(live):
                base = st["skip"] + st["start"]
                ctx = base + chunk
                tokens[i] = st["toks"][st["start"] : st["start"] + chunk]
                positions[i] = np.arange(base, ctx, dtype=np.int32)
                have = self.cache.pages(st["rid"])[: ctx // c.page_size]
                tables[i, : len(have)] = have
                wpages[i], wslots[i] = reserved[st["rid"]]
                # NB: the kernel anchors query positions at ctx - chunk, so
                # ctx must count the pad tail too.  Pad K/V rows are never
                # written; real queries sit at positions < s and causality
                # keeps them off the stale bytes.
                ctxs[i] = ctx
            logits, kp, vp, ks, vs = transformer.prefill_chunk_batched(
                self.params,
                jnp.asarray(tokens),
                self.cache.k_pages,
                self.cache.v_pages,
                jnp.asarray(positions),
                jnp.asarray(tables),
                jnp.asarray(wpages),
                jnp.asarray(wslots),
                cfg=self.model_cfg,
                k_scales=self.cache.k_scales if quant else None,
                v_scales=self.cache.v_scales if quant else None,
                ctx_lens=jnp.asarray(ctxs),
                interpret=self._interpret,
            )
            self.cache.set_pools(kp, vp, ks, vs)
            for i, st in enumerate(live):
                st["start"] += chunk
                if st["start"] >= st["padded"]:
                    st["logits"] = logits[i]
        for st in states:
            if st["logits"] is None or st["rid"] not in self.running:
                continue  # preempted: restarts cleanly on re-admission
            self.cache.trim(st["rid"], st["s"])
            self.cache.register_prefix(st["rid"], st["prompt"].tolist())
            self._n_prefill_tokens += st["rem"]
            first, lp = self._sample_one(
                st["req"], st["logits"][(st["rem"] - 1) % chunk]
            )
            self._emit(st["req"], first, lp)

    def _decode_batch(self) -> None:
        bmax = self.cfg.max_batch
        rows = []  # (rid, token, position, page, slot) for surviving requests
        for rid in list(self.running):
            if rid not in self.running:
                continue  # preempted by an earlier row's OOM this step
            req = self.requests[rid]
            while True:
                try:
                    page, slot = self.cache.reserve_slot(rid)
                    break
                except MemoryError:
                    if not self._preempt(exclude=rid):
                        raise
            tok = req.output[-1] if req.output else req.prompt[-1]
            rows.append((rid, tok, req.length - 1, page, slot))
        rows = [r for r in rows if r[0] in self.running]
        if not rows:
            return
        batch = [r[0] for r in rows]
        n = len(batch)
        tokens = np.zeros((bmax,), np.int32)
        positions = np.zeros((bmax,), np.int32)
        write_pages = np.full((bmax,), self.cache.config.num_pages, np.int32)
        write_slots = np.zeros((bmax,), np.int32)
        for i, (_, tok, pos, page, slot) in enumerate(rows):
            tokens[i], positions[i] = tok, pos
            write_pages[i], write_slots[i] = page, slot
        seq_ids = batch + [-1] * (bmax - n)
        lengths, page_indices = self.cache.batch_view(
            seq_ids, self.cfg.pages_per_seq
        )
        quant = self.cache.config.quantized
        logits, kp, vp, ks, vs = transformer.decode_step(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(positions),
            self.cache.k_pages,
            self.cache.v_pages,
            lengths,
            page_indices,
            jnp.asarray(write_pages),
            jnp.asarray(write_slots),
            cfg=self.model_cfg,
            k_scales=self.cache.k_scales if quant else None,
            v_scales=self.cache.v_scales if quant else None,
            interpret=self._interpret,
        )
        self.cache.set_pools(kp, vp, ks, vs)
        self._n_decode_tokens += len(batch)
        if all(self.requests[r].sampling is None for r in batch):
            # Engine-default params: one sampling call over the full padded
            # batch — BITWISE the historical key stream (decode_loop mirrors
            # it, so multi_step == per-token under the same keys).
            next_tokens = np.asarray(self._sample(logits))
            for i, rid in enumerate(batch):
                self._emit(self.requests[rid], int(next_tokens[i]))
        else:
            reqs = [self.requests[r] for r in batch]
            toks, lps = self._sample_rows(reqs, logits[: len(batch)])
            for i, rid in enumerate(batch):
                self._emit(self.requests[rid], toks[i], lps[i])

    def _decode_batch_many(self, n: int) -> bool:
        """Decode n tokens for the whole running batch in one device call.

        Returns False (caller falls back to single-step) unless every running
        request has >= n tokens of budget AND n cache slots can be reserved
        up-front without preemption.  eos mid-span: the request finishes at
        the eos as usual; its surplus tokens are discarded and ALL its pages
        freed by the normal finish path.  Requests carrying their own
        SamplingParams also force the per-token path: the jitted loop samples
        with ONE static (temperature, top_k, top_p) config and cannot honor
        per-row params / seeds / logprobs."""
        for rid in self.running:
            req = self.requests[rid]
            if req.max_new_tokens - len(req.output) < n:
                return False
            if req.sampling is not None:
                return False
        # Cache length = KV rows written so far (= request length - 1: the
        # newest emitted token is not cached until its decode step writes it).
        start_lens = {rid: self.cache.length(rid) for rid in self.running}
        reserved_ok = True
        for rid in list(self.running):
            try:
                for _ in range(n):
                    self.cache.reserve_slot(rid)
            except MemoryError:
                reserved_ok = False
                break
        if not reserved_ok:
            for rid in self.running:
                self.cache.trim(rid, start_lens[rid])
            return False

        bmax = self.cfg.max_batch
        batch = list(self.running)
        tokens = np.zeros((bmax,), np.int32)
        positions = np.zeros((bmax,), np.int32)
        active = np.zeros((bmax,), bool)
        for i, rid in enumerate(batch):
            req = self.requests[rid]
            tokens[i] = req.output[-1] if req.output else req.prompt[-1]
            positions[i] = start_lens[rid]  # first write position
            active[i] = True
        seq_ids = batch + [-1] * (bmax - len(batch))
        _, page_indices = self.cache.batch_view(seq_ids, self.cfg.pages_per_seq)
        quant = self.cache.config.quantized
        # Non-greedy (round 3; VERDICT #8): thread the engine's PRNG key
        # through the jitted loop — it splits per step exactly like the
        # per-token path, so n multi-step tokens == n per-token steps under
        # the same key stream; the advanced key is stored back.
        sample_kw = {}
        if not self.cfg.greedy:
            sample_kw = dict(
                sample_key=self.sample_key,
                temperature=self.cfg.temperature,
                top_k=self.cfg.top_k,
                top_p=self.cfg.top_p,
            )
        res = transformer.decode_loop(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(positions),
            self.cache.k_pages,
            self.cache.v_pages,
            page_indices,
            cfg=self.model_cfg,
            n_steps=n,
            k_scales=self.cache.k_scales if quant else None,
            v_scales=self.cache.v_scales if quant else None,
            active=jnp.asarray(active),
            interpret=self._interpret,
            **sample_kw,
        )
        if self.cfg.greedy:
            out, kp, vp, ks, vs = res
        else:
            out, kp, vp, ks, vs, self.sample_key = res
        self.cache.set_pools(kp, vp, ks, vs)
        out = np.asarray(out)
        for i, rid in enumerate(batch):
            req = self.requests[rid]
            for t in out[i]:
                self._emit(req, int(t))
                self._n_decode_tokens += 1
                if req.state != "running":
                    break  # finished OR cancelled-by-callback: sequence is
                    #   freed, surplus tokens discard
        return True

    def step_speculative(self, draft_fn, k: int) -> None:
        """One continuous-batching step with speculative decoding.

        ``draft_fn(request, n) -> list[int]`` proposes n draft tokens for a
        running request (from any cheap source: a small model, n-gram cache,
        prompt lookup).  Each request's [last token, k-1 drafts] are scored
        in ONE device call (:func:`transformer.verify_step`); the accepted
        prefix plus a correction token are emitted (1..k tokens per request
        per step), and rejected drafts' cache rows are trimmed so the cache
        invariant (rows cached = emitted length - 1) holds.

        Greedy configs accept by argmax match; sampled configs (round 3;
        VERDICT #8) use the speculative rejection rule
        (:func:`sampling.speculative_accept_sampled`) — exact for the
        deterministic draft sources this engine takes, so every emitted
        token is distributed as a per-token sample from the same filtered
        distribution.  Falls back to a normal step when slots cannot be
        reserved up-front.
        """
        if k < 2:
            raise ValueError("speculative decoding requires k >= 2")
        self._n_steps += 1
        self._admit_and_prefill()
        if not self.running:
            return
        ps_ = self.cache.config.page_size
        cap_tokens = self.cfg.pages_per_seq * ps_
        for rid in self.running:
            req = self.requests[rid]
            if req.max_new_tokens - len(req.output) < 1:
                self._decode_batch()
                return
            if req.sampling is not None:
                # The batched accept rule runs one static filter config; a
                # request with its own params keeps exact semantics via the
                # per-token path.
                self._decode_batch()
                return
            if self.cache.length(rid) + k > cap_tokens:
                # The transient k-row reservation would overflow the
                # per-request page-table view near max length.
                self._decode_batch()
                return
        start_lens = {rid: self.cache.length(rid) for rid in self.running}
        try:
            for rid in list(self.running):
                for _ in range(k):
                    self.cache.reserve_slot(rid)
        except MemoryError:
            for rid in self.running:
                self.cache.trim(rid, start_lens[rid])
            self._decode_batch()
            return

        bmax = self.cfg.max_batch
        batch = list(self.running)
        fed = np.zeros((bmax, k), np.int32)
        positions = np.zeros((bmax,), np.int32)
        write_pages = np.full((bmax, k), self.cache.config.num_pages, np.int32)
        write_slots = np.zeros((bmax, k), np.int32)
        ps = self.cache.config.page_size
        for i, rid in enumerate(batch):
            req = self.requests[rid]
            drafts = list(draft_fn(req, k - 1))[: k - 1]
            drafts += [0] * (k - 1 - len(drafts))  # short drafts pad benignly
            fed[i, 0] = req.output[-1] if req.output else req.prompt[-1]
            fed[i, 1:] = drafts
            positions[i] = start_lens[rid]
            pages = self.cache.pages(rid)
            for j in range(k):
                p = start_lens[rid] + j
                write_pages[i, j] = pages[p // ps]
                write_slots[i, j] = p % ps
        seq_ids = batch + [-1] * (bmax - len(batch))
        _, page_indices = self.cache.batch_view(seq_ids, self.cfg.pages_per_seq)
        quant = self.cache.config.quantized
        logits, kp, vp, ks, vs = transformer.verify_step(
            self.params,
            jnp.asarray(fed),
            jnp.asarray(positions),
            self.cache.k_pages,
            self.cache.v_pages,
            page_indices,
            jnp.asarray(write_pages),
            jnp.asarray(write_slots),
            cfg=self.model_cfg,
            k_scales=self.cache.k_scales if quant else None,
            v_scales=self.cache.v_scales if quant else None,
            interpret=self._interpret,
        )
        self.cache.set_pools(kp, vp, ks, vs)
        if self.cfg.greedy:
            n_emit, emitted = transformer.speculative_accept(
                jnp.asarray(fed[:, 1:]), logits
            )
        else:
            self.sample_key, sub = jax.random.split(self.sample_key)
            n_emit, emitted = sampling.speculative_accept_sampled(
                sub, jnp.asarray(fed[:, 1:]), logits,
                temperature=self.cfg.temperature,
                top_k=self.cfg.top_k,
                top_p=self.cfg.top_p,
            )
        n_emit, emitted = np.asarray(n_emit), np.asarray(emitted)
        for i, rid in enumerate(batch):
            req = self.requests[rid]
            budget = req.max_new_tokens - len(req.output)
            n = min(int(n_emit[i]), budget)
            accepted = n - 1  # drafts whose K/V rows are valid in the cache
            for t in emitted[i, :n]:
                self._emit(req, int(t))
                self._n_decode_tokens += 1
                if req.state != "running":
                    break
            if req.state == "running":
                # Keep fed[0..accepted]'s rows; drop rejected/surplus rows so
                # cached rows == emitted length - 1 again.  (finished OR
                # cancelled requests already freed their whole sequence.)
                self.cache.trim(rid, start_lens[rid] + accepted + 1)

    def run_speculative(
        self, draft_fn, k: int = 4, max_steps: int = 10_000
    ) -> dict[int, list]:
        """Drive :meth:`step_speculative` until all requests finish."""
        for _ in range(max_steps):
            if not self.has_work():
                break
            was_empty = not self.running
            self.step_speculative(draft_fn, k)
            if (
                was_empty
                and self._last_admitted == 0
                and self.scheduler.num_waiting() > 0
            ):
                raise RuntimeError(
                    f"{self.scheduler.num_waiting()} waiting request(s) "
                    "cannot be admitted (insufficient free pages even with "
                    "an empty batch)"
                )
        return {rid: r.output for rid, r in self.requests.items()}

    def _preempt(self, exclude: int) -> bool:
        """Evict the latest-admitted running request (recompute preemption):
        free its pages and requeue it with prompt = everything generated so
        far.  Returns False when nobody but ``exclude`` is running."""
        for rid in reversed(self.running):
            if rid == exclude:
                continue
            req = self.requests[rid]
            req.state = "waiting"
            self.running.remove(rid)
            self.scheduler.finish(rid)
            self.cache.free_sequence(rid)
            self.scheduler.add_request(
                rid, req.length, req.max_new_tokens - len(req.output)
            )
            self._n_preemptions += 1
            return True
        return False

    def _sample(self, logits):
        # logits (V,) or (B, V); ENGINE-DEFAULT params (requests that carry
        # their own SamplingParams go through _sample_one/_sample_rows).
        if self.cfg.greedy:
            return jnp.argmax(logits, axis=-1)
        self.sample_key, sub = jax.random.split(self.sample_key)
        return _sample_logits(
            sub,
            logits.astype(jnp.float32),
            temperature=self.cfg.temperature,
            top_k=self.cfg.top_k,
            top_p=self.cfg.top_p,
        )

    def _params_for(self, req: Request) -> SamplingParams:
        return req.sampling if req.sampling is not None else self._default_sampling

    def _sample_one(self, req: Request, row) -> tuple[int, float | None]:
        """Sample one token for one request from its (V,) logits row,
        honoring per-request params; returns (token, logprob-or-None)."""
        p = self._params_for(req)
        if p.greedy:
            tok = int(jnp.argmax(row, axis=-1))
        else:
            if p.seed is not None:
                # Position-folded per-request key: reproducible regardless of
                # batch composition and checkpoint/resume (no state to save).
                key = jax.random.fold_in(jax.random.key(p.seed), len(req.output))
            else:
                self.sample_key, key = jax.random.split(self.sample_key)
            tok = int(_sample_logits(
                key, row.astype(jnp.float32),
                temperature=p.temperature, top_k=p.top_k, top_p=p.top_p,
            ))
        lp = None
        if p.logprobs:
            lp = float(jax.nn.log_softmax(row.astype(jnp.float32))[tok])
        return tok, lp

    def _sample_rows(self, reqs: list, logits) -> tuple[list, list]:
        """Per-request sampling over a batch of logits rows (len(reqs), V).

        Rows sharing a filter config batch into ONE sampling call (one engine
        key split per group); seeded rows draw from their own position-folded
        streams.  Returns (tokens, logprobs) aligned with ``reqs``."""
        logits = jnp.asarray(logits)
        n = len(reqs)
        tokens: list = [0] * n
        lps: list = [None] * n
        greedy_rows: list[int] = []
        groups: dict[tuple, list[int]] = {}
        for i, r in enumerate(reqs):
            p = self._params_for(r)
            if p.greedy:
                greedy_rows.append(i)
            elif p.seed is not None:
                key = jax.random.fold_in(jax.random.key(p.seed), len(r.output))
                tokens[i] = int(_sample_logits(
                    key, logits[i].astype(jnp.float32),
                    temperature=p.temperature, top_k=p.top_k, top_p=p.top_p,
                ))
            else:
                groups.setdefault(p.filter_key, []).append(i)
        if greedy_rows:
            toks = np.asarray(
                jnp.argmax(logits[jnp.asarray(greedy_rows)], axis=-1)
            )
            for j, i in enumerate(greedy_rows):
                tokens[i] = int(toks[j])
        for fk, rows in groups.items():  # dict order: first-seen, stable
            self.sample_key, sub = jax.random.split(self.sample_key)
            toks = np.asarray(_sample_logits(
                sub, logits[jnp.asarray(rows)].astype(jnp.float32),
                temperature=fk[1], top_k=fk[2], top_p=fk[3],
            ))
            for j, i in enumerate(rows):
                tokens[i] = int(toks[j])
        for i, r in enumerate(reqs):
            if self._params_for(r).logprobs:
                lps[i] = float(
                    jax.nn.log_softmax(logits[i].astype(jnp.float32))[tokens[i]]
                )
        return tokens, lps

    def _emit(self, req: Request, token: int, logprob=None) -> None:
        if req.state != "running":
            # A streaming callback may cancel requests mid-batch (its own or
            # a peer's): later emissions for that request in the same device
            # step must be discarded, not appended — and must not re-run the
            # finish path (running.remove / free_sequence would raise on the
            # already-torn-down request).
            return
        req.output.append(token)
        p = self._params_for(req)
        if p.logprobs:
            req.logprobs.append(logprob)
        eos = p.eos_token if p.eos_token is not None else self.cfg.eos_token
        done = (
            len(req.output) >= req.max_new_tokens
            or (eos is not None and token == eos)
            or token in p.stop_tokens
        )
        if not done and p.stop_sequences:
            out = req.output
            done = any(
                len(out) >= len(ss) and tuple(out[-len(ss):]) == tuple(ss)
                for ss in p.stop_sequences
            )
        if done:
            req.state = "finished"
            self.running.remove(req.req_id)
            self.scheduler.finish(req.req_id)
            self.cache.free_sequence(req.req_id)
        for cb in (req.on_token, self.on_token):
            if cb is not None:
                cb(req, token)
