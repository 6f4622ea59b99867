"""Runtime tests: native allocator/scheduler, paged cache, serving engine.

The engine end-to-end oracle: greedy generation through the continuous-
batching engine (paged decode kernel) must produce the same tokens as naive
generation by repeated full causal forwards (flash prefill kernel) — the
serving-stack analog of the reference's differential test strategy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattention_tpu.models import transformer
from flashattention_tpu.runtime.engine import Engine, EngineConfig
from flashattention_tpu.runtime.kvcache import CacheConfig, PagedKVCache
from flashattention_tpu.runtime.native import PageAllocator, Scheduler
from flashattention_tpu.utils.testing import validate_result


# ── allocator / scheduler (native + fallback) ───────────────────────────────


def test_allocator_alloc_free_cycle():
    a = PageAllocator(8)
    p = a.alloc(8)
    assert sorted(p) == list(range(8))
    assert a.alloc(1) is None and a.num_free() == 0
    a.free(p[:3])
    assert a.num_free() == 3
    assert len(a.alloc(3)) == 3


def test_allocator_no_partial():
    a = PageAllocator(4)
    assert a.alloc(5) is None
    assert a.num_free() == 4  # failed alloc must not leak


def test_scheduler_fcfs_page_budget():
    s = Scheduler(max_batch=4, page_size=8)
    s.add_request(1, 16, 4)  # 2 pages
    s.add_request(2, 64, 4)  # 8 pages
    s.add_request(3, 8, 4)  # 1 page
    # Budget 5: admit req1 (2), then req2 needs 8 > 3 left -> strict FCFS stops.
    assert s.admit(free_pages=5) == [1]
    assert s.num_waiting() == 2
    assert s.admit(free_pages=20) == [2, 3]


def test_scheduler_batch_cap():
    s = Scheduler(max_batch=1, page_size=8)
    s.add_request(1, 8, 1)
    s.add_request(2, 8, 1)
    assert s.admit(free_pages=100) == [1]
    s.finish(1)
    assert s.admit(free_pages=100) == [2]


def test_scheduler_worst_case_reservation():
    s = Scheduler(max_batch=4, page_size=8, reserve_worst_case=True)
    s.add_request(1, 8, 17)  # now: 1 page; worst case: ceil(25/8) = 4 pages
    assert s.admit(free_pages=3) == []
    assert s.admit(free_pages=4) == [1]


# ── paged KV cache ───────────────────────────────────────────────────────────


def cache_cfg(**kw):
    base = dict(
        num_layers=2,
        num_kv_heads=2,
        head_dim=16,
        page_size=4,
        num_pages=16,
        dtype="float32",
    )
    base.update(kw)
    return CacheConfig(**base)


def test_cache_append_and_view_roundtrip():
    cfg = cache_cfg()
    cache = PagedKVCache(cfg)
    k = jax.random.normal(jax.random.key(0), (2, 6, 2, 16))
    v = jax.random.normal(jax.random.key(1), (2, 6, 2, 16))
    cache.append(7, k, v)
    assert cache.length(7) == 6
    lengths, table = cache.batch_view([7], pages_per_seq=4)
    assert int(lengths[0]) == 6
    pages = np.asarray(table[0])
    # Row 3 of the gathered pages == token 3 of the appended K.
    got = cache.k_pages[:, pages[0], :, 3, :]  # (L, KVH, d) head-major pool
    validate_result(got, jnp.moveaxis(k, 2, 1)[:, :, 3], 1e-6)


def test_cache_append_across_pages_and_free():
    cfg = cache_cfg()
    cache = PagedKVCache(cfg)
    for t in range(9):  # 9 tokens, page_size 4 -> 3 pages
        k = jnp.full((2, 1, 2, 16), float(t))
        cache.append(1, k, k)
    assert cache.length(1) == 9
    used_before = cache.num_free_pages()
    cache.free_sequence(1)
    assert cache.num_free_pages() == used_before + 3


def test_cache_reserve_slot_sequence():
    cfg = cache_cfg()
    cache = PagedKVCache(cfg)
    slots = [cache.reserve_slot(5) for _ in range(6)]
    assert [s for _, s in slots] == [0, 1, 2, 3, 0, 1]
    assert cache.length(5) == 6


def test_cache_oom():
    cfg = cache_cfg(num_pages=1)
    cache = PagedKVCache(cfg)
    cache.append(1, jnp.zeros((2, 4, 2, 16)), jnp.zeros((2, 4, 2, 16)))
    with pytest.raises(MemoryError):
        cache.append(1, jnp.zeros((2, 1, 2, 16)), jnp.zeros((2, 1, 2, 16)))


def test_cache_quantized_roundtrip():
    cfg = cache_cfg(dtype="int8")
    cache = PagedKVCache(cfg)
    k = jax.random.normal(jax.random.key(2), (2, 4, 2, 16))
    cache.append(3, k, k)
    lengths, table = cache.batch_view([3], pages_per_seq=2)
    page = int(table[0, 0])
    deq = (
        cache.k_pages[:, page].astype(jnp.float32)
        * cache.k_scales[:, page][..., None]
    )  # (L, KVH, ps, d) head-major pool
    validate_result(deq, jnp.moveaxis(k, 2, 1), 2e-2)


# ── engine end-to-end ────────────────────────────────────────────────────────


def reference_generate(params, cfg, prompt, n_new):
    """Greedy generation via repeated full causal forwards (ground truth)."""
    toks = list(prompt)
    for _ in range(n_new):
        s = len(toks)
        sb = 8
        while sb < s:
            sb *= 2
        padded = jnp.asarray(np.pad(np.asarray(toks, np.int32), (0, sb - s))[None])
        logits, _, _ = transformer.prefill(params, padded, cfg=cfg)
        toks.append(int(jnp.argmax(logits[0, s - 1])))
    return toks[len(prompt) :]


@pytest.fixture(scope="module")
def tiny_model():
    import dataclasses

    cfg = dataclasses.replace(transformer.ModelConfig.tiny(), dtype="float32")
    params = transformer.init_params(jax.random.key(0), cfg)
    return params, cfg


def test_engine_matches_reference_single(tiny_model):
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=2, pages_per_seq=8))
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    rid = eng.add_request(prompt, max_new_tokens=6)
    out = eng.run()[rid]
    want = reference_generate(params, cfg, prompt, 6)
    assert out == want, (out, want)


def test_engine_continuous_batching(tiny_model):
    # Three staggered requests with different lengths; all must match the
    # sequential reference, and the engine must overlap them (continuous).
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=4, pages_per_seq=8))
    prompts = {
        eng.add_request([1, 2, 3], 5): [1, 2, 3],
        eng.add_request([7, 7, 7, 7, 7, 7], 3): [7, 7, 7, 7, 7, 7],
    }
    budgets = {rid: n for rid, n in zip(prompts, (5, 3))}
    eng.step()  # first two admitted and prefilled
    late = eng.add_request([9, 8], 4)
    prompts[late] = [9, 8]
    budgets[late] = 4
    outs = eng.run()
    for rid, prompt in prompts.items():
        assert len(outs[rid]) == budgets[rid], (rid, outs[rid])
        want = reference_generate(params, cfg, prompt, budgets[rid])
        assert outs[rid] == want, (rid, outs[rid], want)
    # All pages returned after everything finished.
    assert eng.cache.num_free_pages() == 64


def test_engine_admission_waits_for_pages(tiny_model):
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=3,  # room for ~one request at a time
        dtype="float32",
    )
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=4, pages_per_seq=2))
    r1 = eng.add_request([1, 2, 3, 4, 5, 6, 7, 8], 4)  # 1 page prompt + growth
    r2 = eng.add_request([5, 5, 5, 5, 5, 5, 5, 5], 4)
    outs = eng.run(max_steps=100)
    assert len(outs[r1]) == 4 and len(outs[r2]) == 4
    # Recompute-preemption must preserve token-exactness, not just lengths.
    assert outs[r1] == reference_generate(params, cfg, [1, 2, 3, 4, 5, 6, 7, 8], 4)
    assert outs[r2] == reference_generate(params, cfg, [5] * 8, 4)


def test_engine_checkpoint_resume():
    """Snapshot mid-generation, restore into a fresh engine, outputs match."""
    cfg = transformer.ModelConfig.tiny()
    params = transformer.init_params(jax.random.key(0), cfg)
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
    )
    ecfg = EngineConfig(max_batch=4, pages_per_seq=8)
    prompts = [[1, 2, 3], [9, 8, 7, 6], [5, 5]]

    full = Engine(params, cfg, ccfg, ecfg)
    for p in prompts:
        full.add_request(p, max_new_tokens=10)
    want = full.run()

    half = Engine(params, cfg, ccfg, ecfg)
    for p in prompts:
        half.add_request(p, max_new_tokens=10)
    for _ in range(4):  # generate a few tokens, then snapshot mid-flight
        half.step()
    state = half.state_dict()

    resumed = Engine.from_state(state, params, cfg, ccfg, ecfg)
    got = resumed.run()
    assert got == want, (got, want)


def test_engine_chunked_prefill_matches_whole_prompt():
    """Chunked prefill must generate the same tokens as whole-prompt prefill."""
    cfg = transformer.ModelConfig.tiny()
    params = transformer.init_params(jax.random.key(0), cfg)

    def make(chunk):
        ccfg = CacheConfig(
            num_layers=cfg.num_layers,
            num_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            page_size=8,
            num_pages=64,
        )
        return Engine(
            params, cfg, ccfg,
            EngineConfig(max_batch=2, pages_per_seq=16, prefill_chunk=chunk),
        )

    rng = np.random.default_rng(0)
    long_prompt = rng.integers(0, cfg.vocab_size, size=37).tolist()  # ragged
    short_prompt = [3, 1, 4]

    whole = make(0)  # chunking disabled
    r1 = whole.add_request(long_prompt, 6)
    r2 = whole.add_request(short_prompt, 6)
    want = whole.run()

    chunked = make(16)  # 2 pages per chunk; 37 tokens -> 3 chunks (last padded)
    c1 = chunked.add_request(long_prompt, 6)
    c2 = chunked.add_request(short_prompt, 6)
    got = chunked.run()
    assert got[c1] == want[r1], (got[c1], want[r1])
    assert got[c2] == want[r2], (got[c2], want[r2])


def test_engine_chunked_prefill_quantized():
    cfg = transformer.ModelConfig.tiny()
    params = transformer.init_params(jax.random.key(0), cfg)
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="int8",
    )
    eng = Engine(
        params, cfg, ccfg,
        EngineConfig(max_batch=2, pages_per_seq=16, prefill_chunk=16),
    )
    rng = np.random.default_rng(1)
    rid = eng.add_request(rng.integers(0, cfg.vocab_size, size=40).tolist(), 5)
    out = eng.run()
    assert len(out[rid]) == 5


def test_scheduler_worst_case_reservations_survive_admit_calls():
    """reserve_worst_case must hold back running requests' decode headroom
    on every admit() call, not just the one that admitted them."""
    from flashattention_tpu.runtime.native import Scheduler

    s = Scheduler(max_batch=4, page_size=1, reserve_worst_case=True)
    s.add_request(1, 1, 99)  # worst case 100 pages
    assert s.admit(free_pages=100) == [1]
    # Caller allocated only the 1 prompt page; 99 are physically free but
    # reserved for request 1's decode. Request 2 (needs 99) must NOT admit.
    s.add_request(2, 99, 0)
    assert s.admit(free_pages=99) == []
    # Once request 1 finishes, its reservation releases.
    s.finish(1)
    assert s.admit(free_pages=99) == [2]


def test_scheduler_worst_case_python_fallback_matches(monkeypatch):
    """The pure-Python scheduler fallback enforces the same reservations."""
    from flashattention_tpu.runtime import native

    monkeypatch.setattr(native, "_load", lambda: None)
    s = native.Scheduler(4, 1, reserve_worst_case=True)
    assert not s.native
    s.add_request(1, 1, 99)
    assert s.admit(free_pages=100) == [1]
    s.add_request(2, 99, 0)
    assert s.admit(free_pages=99) == []
    s.finish(1)
    assert s.admit(free_pages=99) == [2]


def test_engine_batched_prefill_matches_sequential():
    """Same-bucket prompts prefilled as one batch == one-by-one prefill."""
    cfg = transformer.ModelConfig.tiny()
    params = transformer.init_params(jax.random.key(0), cfg)

    def make(max_batch):
        ccfg = CacheConfig(
            num_layers=cfg.num_layers,
            num_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim,
            page_size=8,
            num_pages=64,
        )
        return Engine(
            params, cfg, ccfg, EngineConfig(max_batch=max_batch, pages_per_seq=8)
        )

    prompts = [[1, 2, 3], [4, 5], [6, 7, 8, 9], [10]]  # all bucket to 8
    seq = make(1)  # admits one at a time -> sequential prefills
    want = {}
    for p in prompts:
        rid = seq.add_request(p, 4)
        want[tuple(p)] = rid
    souts = seq.run()

    bat = make(4)  # admits all four -> one batched prefill
    bids = [bat.add_request(p, 4) for p in prompts]
    bouts = bat.run()
    for p, bid in zip(prompts, bids):
        assert bouts[bid] == souts[want[tuple(p)]], p


def test_engine_short_generations_drain_without_deadlock_error():
    """Requests finishing during their own prefill must not trip the
    admission-deadlock detector (max_batch=1, max_new_tokens=1)."""
    cfg = transformer.ModelConfig.tiny()
    params = transformer.init_params(jax.random.key(0), cfg)
    ccfg = CacheConfig(
        num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, page_size=8, num_pages=64,
    )
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=1, pages_per_seq=4))
    r1 = eng.add_request([1, 2, 3], 1)
    r2 = eng.add_request([4, 5], 1)
    out = eng.run()
    assert len(out[r1]) == 1 and len(out[r2]) == 1


def test_engine_chunked_overreservation_rejected_at_add():
    """A prompt whose chunk-padded footprint exceeds the pool must be
    rejected at add_request, not crash mid-serve."""
    cfg = transformer.ModelConfig.tiny()
    params = transformer.init_params(jax.random.key(0), cfg)
    ccfg = CacheConfig(
        num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, page_size=8, num_pages=4,
    )
    eng = Engine(
        params, cfg, ccfg,
        EngineConfig(max_batch=1, pages_per_seq=4, prefill_chunk=16),
    )
    # 17 tokens pad to 32 for chunking -> 4 pages transiently; span needs
    # ceil(18/8)=3 <= 4, but padded needs 4 == cap: accepted.
    eng.add_request(list(range(17)), 1)
    # 25 tokens pad to 32 -> 4 pages, span ceil(26/8)=4 <= 4: accepted too;
    # but 33 tokens pad to 48 -> 6 pages > cap 4: rejected up front.
    with pytest.raises(ValueError):
        eng.add_request(list(range(33)), 1)


def test_engine_misconfigured_chunk_rejected_at_init():
    cfg = transformer.ModelConfig.tiny()
    params = transformer.init_params(jax.random.key(0), cfg)
    ccfg = CacheConfig(
        num_layers=cfg.num_layers, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, page_size=8, num_pages=16,
    )
    with pytest.raises(ValueError):
        Engine(params, cfg, ccfg, EngineConfig(prefill_chunk=20))


# ── sampling (temperature / top-k / top-p) ──────────────────────────────────


def test_engine_config_validates_sampling():
    with pytest.raises(ValueError):
        EngineConfig(greedy=False, temperature=0.0)
    with pytest.raises(ValueError):
        EngineConfig(greedy=False, temperature=-1.0)
    with pytest.raises(ValueError):
        EngineConfig(top_k=0)
    with pytest.raises(ValueError):
        EngineConfig(top_p=0.0)
    with pytest.raises(ValueError):
        EngineConfig(top_p=1.5)
    EngineConfig(greedy=True, temperature=0.0)  # unused when greedy: allowed


def test_sample_logits_top_k_top_p_support():
    """Filtered sampling only ever draws from the kept candidate set."""
    from flashattention_tpu.runtime.engine import _sample_logits

    logits = jnp.asarray([[3.0, 2.9, 0.0, -1.0, 2.8, -2.0]])
    keys = jax.random.split(jax.random.key(0), 64)
    topk = {
        int(_sample_logits(k, logits, temperature=1.0, top_k=3, top_p=None)[0])
        for k in keys
    }
    assert topk <= {0, 1, 4} and len(topk) > 1  # the 3 largest, actually mixed
    # top_p small enough that only the argmax survives -> deterministic.
    nucleus = {
        int(_sample_logits(k, logits, temperature=1.0, top_k=None, top_p=0.05)[0])
        for k in keys
    }
    assert nucleus == {0}
    # top-1 always kept even when its own prob > top_p.
    assert int(
        _sample_logits(keys[0], logits, temperature=1.0, top_k=1, top_p=0.99)[0]
    ) == 0


def test_engine_sampling_resume_deterministic(tiny_model):
    """Non-greedy: the PRNG key survives state_dict/from_state, so restoring
    the same snapshot twice yields identical continuations (ADVICE r1)."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    ecfg = EngineConfig(
        max_batch=2, pages_per_seq=8, greedy=False, temperature=0.8, top_k=16
    )
    eng = Engine(params, cfg, ccfg, ecfg)
    eng.add_request([3, 1, 4, 1], max_new_tokens=8)
    for _ in range(3):
        eng.step()
    state = eng.state_dict()
    outs = [
        Engine.from_state(state, params, cfg, ccfg, ecfg).run()
        for _ in range(2)
    ]
    assert outs[0] == outs[1]
    assert all(len(o) == 8 for o in outs[0].values())


def test_decode_loop_matches_reference(tiny_model):
    """N-step jitted decode loop == greedy reference continuation."""
    params, cfg = tiny_model
    ps, n_new = 8, 5
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    b, s = 2, len(prompt)
    toks = jnp.asarray([prompt, prompt[::-1]], jnp.int32)
    logits, k_rows, v_rows = transformer.prefill(params, toks, cfg=cfg)
    pps = 4  # pages per sequence: covers s + n_new
    num_pages = b * pps + 1
    kp = jnp.zeros(
        (cfg.num_layers, num_pages, cfg.num_kv_heads, ps, cfg.head_dim),
        jnp.float32,
    )
    vp = jnp.zeros_like(kp)
    page_indices = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    for bi in range(b):
        rows_k = jnp.moveaxis(k_rows[:, bi], 2, 1)  # (L, KVH, S, d)
        rows_v = jnp.moveaxis(v_rows[:, bi], 2, 1)
        kp = kp.at[:, bi * pps, :, :s, :].set(rows_k)
        vp = vp.at[:, bi * pps, :, :s, :].set(rows_v)
    first = jnp.argmax(logits[:, s - 1], axis=-1).astype(jnp.int32)
    out, *_ = transformer.decode_loop(
        params,
        first,
        jnp.full((b,), s, jnp.int32),
        kp,
        vp,
        page_indices,
        cfg=cfg,
        n_steps=n_new - 1,
    )
    for bi, p in enumerate([prompt, prompt[::-1]]):
        want = reference_generate(params, cfg, p, n_new)
        assert int(first[bi]) == want[0]
        assert list(np.asarray(out[bi])) == want[1:], (bi, out[bi], want)


@pytest.mark.parametrize("eos", [None, "third"])
def test_engine_multi_step_matches_single(tiny_model, eos):
    """run(multi_step=4) == run(multi_step=1) token-for-token, including an
    eos that lands mid-span (surplus tokens discarded, pages freed)."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    prompts = [[1, 2, 3], [9, 8, 7, 6]]
    eos_token = None
    if eos == "third":
        probe = Engine(params, cfg, ccfg, EngineConfig(max_batch=4, pages_per_seq=8))
        rid = probe.add_request(prompts[0], 10)
        eos_token = probe.run()[rid][2]  # third generated token becomes eos
    ecfg = EngineConfig(max_batch=4, pages_per_seq=8, eos_token=eos_token)

    outs = []
    for ms in (1, 4):
        eng = Engine(params, cfg, ccfg, ecfg)
        for p in prompts:
            eng.add_request(p, max_new_tokens=9)  # 9 % 4 != 0: tail fallback
        outs.append(eng.run(multi_step=ms))
        assert eng.cache.num_free_pages() == 64  # everything freed
    assert outs[0] == outs[1], outs
    if eos_token is not None:
        assert any(o and o[-1] == eos_token for o in outs[0].values())


def test_engine_multi_step_rollback_under_page_pressure(tiny_model):
    """When the n-slot up-front reservation cannot be satisfied, the engine
    must roll back cleanly and fall back to single-step decoding with
    correct outputs and no leaked pages (round-2 review finding)."""
    params, cfg = tiny_model
    # 9 pages: two requests of 8-token prompts (1 page each) + 7 spare;
    # 2 requests x multi_step=4 needs 8 new slots but only 1 page-boundary
    # crossing fits -> the bulk reservation hits MemoryError at some point.
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=4,
        dtype="float32",
    )
    ecfg = EngineConfig(max_batch=4, pages_per_seq=2)
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8], [8, 7, 6, 5, 4, 3, 2, 1]]

    outs = []
    for ms in (1, 8):
        eng = Engine(params, cfg, ccfg, ecfg)
        for p in prompts:
            eng.add_request(p, max_new_tokens=8)
        outs.append(eng.run(max_steps=200, multi_step=ms))
        assert eng.cache.num_free_pages() == 4
    assert outs[0] == outs[1], outs
    for p, o in zip(prompts, outs[0].values()):
        assert o == reference_generate(params, cfg, p, 8)


def test_verify_step_matches_prefill_logits(tiny_model):
    """Speculative verification (one kernel pass over k fed tokens) produces
    the same logits as a full prefill at those positions (round 2)."""
    params, cfg = tiny_model
    ps, kk = 8, 4
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    s = len(prompt)
    b = 2
    toks = jnp.asarray([prompt, prompt[::-1]], jnp.int32)
    logits0, k_rows, v_rows = transformer.prefill(params, toks, cfg=cfg)
    pps = 2
    kp = jnp.zeros(
        (cfg.num_layers, b * pps + 1, cfg.num_kv_heads, ps, cfg.head_dim),
        jnp.float32,
    )
    vp = jnp.zeros_like(kp)
    page_indices = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    for bi in range(b):
        kp = kp.at[:, bi * pps, :, :s, :].set(jnp.moveaxis(k_rows[:, bi], 2, 1))
        vp = vp.at[:, bi * pps, :, :s, :].set(jnp.moveaxis(v_rows[:, bi], 2, 1))
    # Feed tokens: current token (model's own argmax) + 3 drafts (arbitrary).
    first = jnp.argmax(logits0[:, s - 1], axis=-1).astype(jnp.int32)
    drafts = jnp.asarray([[7, 7, 7], [1, 2, 3]], jnp.int32)
    fed = jnp.concatenate([first[:, None], drafts], axis=1)  # (B, 4)
    pos = jnp.arange(s, s + kk)
    wp = jnp.asarray(
        [[int(page_indices[bi, p // ps]) for p in pos] for bi in range(b)],
        jnp.int32,
    )
    wslots = jnp.broadcast_to(pos % ps, (b, kk)).astype(jnp.int32)
    vlogits, *_ = transformer.verify_step(
        params, fed, jnp.full((b,), s, jnp.int32), kp, vp, page_indices,
        wp, wslots, cfg=cfg,
    )
    # Ground truth: full prefill over prompt + fed tokens.
    full = jnp.concatenate([toks, fed], axis=1)
    pad = -(-full.shape[1] // 8) * 8 - full.shape[1]
    want_logits, _, _ = transformer.prefill(
        params, jnp.pad(full, ((0, 0), (0, pad))), cfg=cfg
    )
    for j in range(kk):
        # verify logits[:, j] = distribution after prompt + fed[0..j]
        # = prefill row (s + j) of the concatenated sequence.
        validate_result(
            vlogits[:, j], want_logits[:, s + j], 2e-3, name=f"logits[{j}]"
        )
    # Acceptance: self-drafted (model argmax) tokens accept fully.
    self_drafts = jnp.argmax(vlogits[:, :-1], axis=-1).astype(jnp.int32)
    n, emitted = transformer.speculative_accept(self_drafts, vlogits)
    assert list(np.asarray(n)) == [kk, kk]
    # A wrong draft at index 1 caps acceptance at 1 draft + 1 correction.
    bad = self_drafts.at[:, 1].set(self_drafts[:, 1] + 1)
    n2, emitted2 = transformer.speculative_accept(bad, vlogits)
    assert list(np.asarray(n2)) == [2, 2]
    np.testing.assert_array_equal(
        np.asarray(emitted2[:, 0]), np.asarray(self_drafts[:, 0])
    )
    np.testing.assert_array_equal(  # correction = the model's own token
        np.asarray(emitted2[:, 1]), np.asarray(self_drafts[:, 1])
    )


def test_engine_speculative_matches_plain(tiny_model):
    """run_speculative == plain run token-for-token, with (a) oracle drafts
    (everything accepted, few steps) and (b) adversarial drafts (everything
    rejected, still correct — one corrected token per step)."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    ecfg = EngineConfig(max_batch=4, pages_per_seq=8)
    prompts = [[1, 2, 3], [9, 8, 7, 6]]

    plain = Engine(params, cfg, ccfg, ecfg)
    for p in prompts:
        plain.add_request(p, max_new_tokens=9)
    want = plain.run()
    truth = {  # rid -> full greedy continuation for the oracle draft_fn
        rid: list(prompt) + out
        for (rid, out), prompt in zip(want.items(), prompts)
    }

    def oracle_drafts(req, n):
        done = req.length
        full = truth[req.req_id]
        return full[done : done + n]  # the true continuation (then pads)

    def garbage_drafts(req, n):
        return [(req.length * 7 + j) % cfg.vocab_size for j in range(n)]

    for name, fn in (("oracle", oracle_drafts), ("garbage", garbage_drafts)):
        eng = Engine(params, cfg, ccfg, ecfg)
        for p in prompts:
            eng.add_request(p, max_new_tokens=9)
        got = eng.run_speculative(fn, k=4)
        assert got == want, (name, got, want)
        assert eng.cache.num_free_pages() == 64, name
        if name == "oracle":
            # All drafts accepted: far fewer steps than tokens generated.
            assert eng.stats()["steps"] <= 5, eng.stats()


def test_prefix_caching_shares_pages_and_stays_correct(tiny_model):
    """Concurrent requests with a common prompt prefix share physical pages
    (refcounted, full pages only) and still generate exactly the reference
    tokens; all pages return when everything finishes (round 2)."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    ecfg = EngineConfig(max_batch=4, pages_per_seq=8, prefill_chunk=8)
    base = [7, 1, 8, 2, 8, 1, 8, 2, 3, 1, 4, 1, 5, 9, 2, 6]  # two full pages
    prompts = [
        base + [2, 7],            # shares both pages
        base + [9, 9, 9],         # shares both pages, diverges after
        base[:8] + [5, 5, 5, 5],  # shares only the first page
    ]
    eng = Engine(params, cfg, ccfg, ecfg)
    r0 = eng.add_request(base + [1], 4)
    eng.step()  # r0 prefilled; its full pages registered
    assert eng.cache._prefix_index  # something is published
    tokens_before = eng._n_prefill_tokens
    rids = [eng.add_request(p, 4) for p in prompts]
    eng.step()  # the new requests admit and adopt the shared prefix
    shared_counts = [n for n in eng.cache._refs.values() if n > 1]
    assert shared_counts, "no page ended up shared"
    # Prefill work done for the three new prompts excludes the shared pages.
    new_prefill = eng._n_prefill_tokens - tokens_before
    full = sum(len(p) for p in prompts)
    assert new_prefill <= full - 2 * 8 - 2 * 8 - 8 + 3 * 0 + 8  # >=3 pages saved
    outs = eng.run()
    for rid, p in zip(rids, prompts):
        assert outs[rid] == reference_generate(params, cfg, p, 4), rid
    assert eng.cache.num_free_pages() == 64
    assert not eng.cache._refs
    # Persistence (round 3): the prefix pages outlive their last owner,
    # parked in the reclaimable LRU with their index entries intact.
    assert eng.cache._prefix_index
    assert len(eng.cache._cached_free) == len(set(eng.cache._prefix_index.values()))


def test_durable_checkpoint_roundtrip(tiny_model, tmp_path):
    """Orbax params + engine-state sidecar round-trip: a restored process
    (fresh Engine.from_state with loaded params) continues identically."""
    from flashattention_tpu.utils.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    ecfg = EngineConfig(max_batch=4, pages_per_seq=8)
    eng = Engine(params, cfg, ccfg, ecfg)
    eng.add_request([3, 1, 4, 1], max_new_tokens=8)
    for _ in range(3):
        eng.step()
    want = dict(eng.run())  # finish the original for ground truth... 
    # (run() mutates; snapshot was taken before, so re-run a twin instead)
    eng2 = Engine(params, cfg, ccfg, ecfg)
    eng2.add_request([3, 1, 4, 1], max_new_tokens=8)
    for _ in range(3):
        eng2.step()
    save_checkpoint(
        str(tmp_path / "ckpt"), params, engine_state=eng2.state_dict()
    )

    restored_params, engine_state = load_checkpoint(str(tmp_path / "ckpt"))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    resumed = Engine.from_state(engine_state, restored_params, cfg, ccfg, ecfg)
    got = resumed.run()
    assert got == want, (got, want)


def test_engine_sliding_window_softcap_model():
    """A Mistral/Gemma-class model (sliding window + logit softcap) serves
    end-to-end — batch prefill, chunked prefill, decode, multi-step, and
    speculative — matching the full-forward reference (round 2)."""
    import dataclasses

    cfg = dataclasses.replace(
        transformer.ModelConfig.tiny(),
        dtype="float32",
        sliding_window=12,
        logit_softcap=30.0,
    )
    params = transformer.init_params(jax.random.key(2), cfg)
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    prompts = [[3, 1, 4, 1, 5, 9, 2, 6], list(range(1, 19))]  # 2nd: chunked
    want = {
        tuple(p): reference_generate(params, cfg, p, 6) for p in prompts
    }
    for mode in ("plain", "multi", "spec"):
        eng = Engine(
            params, cfg, ccfg, EngineConfig(max_batch=4, pages_per_seq=8)
        )
        rids = {eng.add_request(p, 6): tuple(p) for p in prompts}
        if mode == "plain":
            outs = eng.run()
        elif mode == "multi":
            outs = eng.run(multi_step=3)
        else:
            outs = eng.run_speculative(lambda req, n: [1] * n, k=3)
        for rid, key in rids.items():
            assert outs[rid] == want[key], (mode, outs[rid], want[key])


# ── sampled multi-step + sampled speculative decoding (round 3; VERDICT #8) ──


def test_engine_sampled_multi_step_matches_per_token(tiny_model):
    """Non-greedy run(multi_step=4) == per-token run under the SAME key
    stream: decode_loop threads the engine PRNG key through its fori_loop,
    splitting once per step exactly like the per-token path."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    ecfg = EngineConfig(
        max_batch=4, pages_per_seq=8, greedy=False, temperature=0.8, top_k=24
    )
    prompts = [[3, 1, 4, 1], [5, 9, 2, 6, 5, 3]]
    outs = []
    for ms in (1, 4):
        eng = Engine(params, cfg, ccfg, ecfg)
        for p in prompts:
            eng.add_request(p, max_new_tokens=8)
        outs.append(eng.run(multi_step=ms))
    assert outs[0] == outs[1]
    assert all(len(o) == 8 for o in outs[0].values())


def test_speculative_accept_sampled_marginal_is_exact():
    """The point-mass rejection rule emits first tokens distributed EXACTLY
    as the filtered target (accept w.p. p(d); reject -> renormalized rest),
    checked empirically over many keys against the analytic distribution."""
    from flashattention_tpu.ops.sampling import (
        filter_logits,
        speculative_accept_sampled,
    )

    logits = jnp.asarray(
        [[[2.0, 1.0, 0.5, -0.5, 0.0], [0.0, 2.0, 1.0, 0.0, -1.0],
          [1.0, 0.0, 0.0, 2.0, 0.5]]]
    )  # (1, k=3, V=5)
    drafts = jnp.asarray([[2, 1]])  # propose token 2 then token 1
    kw = dict(temperature=0.7, top_k=4, top_p=0.95)

    keys = jax.random.split(jax.random.key(7), 4096)
    n_emit, emitted = jax.vmap(
        lambda k: speculative_accept_sampled(k, drafts, logits, **kw)
    )(keys)
    first = np.asarray(emitted[:, 0, 0])
    want = np.asarray(
        jax.nn.softmax(filter_logits(logits, **kw), axis=-1)[0, 0]
    )
    got = np.bincount(first, minlength=5) / len(keys)
    np.testing.assert_allclose(got, want, atol=0.03)
    # Contract invariants: 1 <= n_emit <= k; accepted prefix == the drafts.
    n = np.asarray(n_emit[:, 0])
    assert n.min() >= 1 and n.max() <= 3
    em = np.asarray(emitted[:, 0])
    for i in range(len(keys)):
        for j in range(n[i] - 1):
            assert em[i, j] == np.asarray(drafts)[0, j]


def test_engine_speculative_sampled_near_greedy_limit(tiny_model):
    """Sampled speculative decoding at temperature -> 0 reproduces the greedy
    speculative engine token-for-token (p collapses to the argmax point mass,
    so accept/reject and corrections all become deterministic)."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    prompts = [[1, 2, 3], [9, 8, 7, 6]]

    def drafts(req, n):
        return [(req.length * 3 + j) % cfg.vocab_size for j in range(n)]

    runs = {}
    for name, ecfg in (
        ("greedy", EngineConfig(max_batch=4, pages_per_seq=8)),
        (
            "sampled",
            EngineConfig(
                max_batch=4, pages_per_seq=8, greedy=False, temperature=1e-4
            ),
        ),
    ):
        eng = Engine(params, cfg, ccfg, ecfg)
        for p in prompts:
            eng.add_request(p, max_new_tokens=9)
        runs[name] = eng.run_speculative(drafts, k=3)
        assert eng.cache.num_free_pages() == 64, name
    assert runs["greedy"] == runs["sampled"]


def test_prefix_cache_persistence_and_lru_eviction(tiny_model):
    """Round 3: prefix pages persist after their owner finishes (a later
    identical prompt hits the cache with zero live requests in between), the
    parked pages are reclaimable (num_free_pages counts them, allocation
    evicts LRU-first), and eviction drops their index entries."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=10,
        dtype="float32",
    )
    ecfg = EngineConfig(max_batch=2, pages_per_seq=6, prefill_chunk=8)
    base = [7, 1, 8, 2, 8, 1, 8, 2, 3, 1, 4, 1, 5, 9, 2, 6]  # two full pages
    eng = Engine(params, cfg, ccfg, ecfg)
    r0 = eng.add_request(base + [1], 3)
    out0 = eng.run()[r0]
    cache = eng.cache
    assert not cache._refs and cache._prefix_index
    parked = set(cache._cached_free)
    assert parked and cache.num_free_pages() == 10
    assert cache.allocator.num_free() == 10 - len(parked)

    # A fresh identical prompt hits the PERSISTED prefix: both full pages
    # adopt without prefill work, and the revived pages leave the LRU.
    n_sh, pages_sh = cache.match_prefix(base + [2])
    assert n_sh == 16 and set(pages_sh) <= parked
    r1 = eng.add_request(base + [1], 3)
    out1 = eng.run()[r1]
    assert out1 == out0  # same prompt -> same tokens (greedy)
    assert set(cache._cached_free) >= set(pages_sh)  # re-parked after finish

    # Page pressure evicts parked pages LRU-first and drops their index
    # entries; capacity is never reduced by parked pages.
    keys_before = dict(cache._prefix_index)
    got = cache._alloc(10)  # everything, forcing eviction of all parked
    assert got is not None and len(got) == 10
    assert not cache._cached_free and not cache._prefix_index
    assert keys_before  # the entries existed until eviction
    cache.allocator.free(got)
    assert cache.match_prefix(base + [2])[0] == 0  # evicted -> miss


def test_batched_chunked_prefill_matches_reference(tiny_model, monkeypatch):
    """Round 3: concurrent long prompts prefill in LOCKSTEP batched dispatches
    (one prefill_chunk_batched call per chunk round, not per request) and
    still produce token-exact outputs — batching is a scheduling decision,
    bitwise invisible to the result."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    ecfg = EngineConfig(max_batch=4, pages_per_seq=8, prefill_chunk=8)
    rng = np.random.default_rng(5)
    # Ragged lengths: 3, 2, and 4 chunk rounds respectively.
    prompts = [
        rng.integers(1, cfg.vocab_size, n).tolist() for n in (17, 9, 26)
    ]
    calls = []
    real = transformer.prefill_chunk_batched

    def spy(params_, tokens, *a, **kw):
        calls.append(int(tokens.shape[0]))
        return real(params_, tokens, *a, **kw)

    monkeypatch.setattr(transformer, "prefill_chunk_batched", spy)
    eng = Engine(params, cfg, ccfg, ecfg)
    rids = [eng.add_request(p, 4) for p in prompts]
    outs = eng.run()
    for rid, p in zip(rids, prompts):
        assert outs[rid] == reference_generate(params, cfg, p, 4), rid
    # Lockstep: 4 rounds total (max chunk count), not 3+2+4 dispatches; the
    # first two rounds carry all three requests (batch bucket 4).
    assert len(calls) == 4, calls
    assert calls[0] == 4 and calls[1] == 4, calls


def test_engine_cancel_waiting_and_running(tiny_model):
    """Round 3: cancel() aborts a request wherever it sits — a waiting one
    leaves the admission queue, a running one drops out of the decode batch
    with its pages freed immediately — and peers are unaffected."""
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=3,  # too small for two concurrent 2-page prompts
        dtype="float32",
    )
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=4, pages_per_seq=3))
    p0 = list(range(1, 17))
    r0 = eng.add_request(p0, 6)
    r1 = eng.add_request([9] * 16, 6)  # waits on pages
    eng.step()
    assert eng.requests[r0].state == "running"
    assert eng.requests[r1].state == "waiting"
    # Cancel the waiting request: it must never run.
    assert eng.cancel(r1) is True
    assert eng.scheduler.num_waiting() == 0
    # Cancel the running request mid-generation: pages free immediately.
    eng.step()
    partial = list(eng.requests[r0].output)
    assert partial and eng.requests[r0].state == "running"
    assert eng.cancel(r0) is True
    assert eng.requests[r0].state == "cancelled"
    assert eng.cache.num_free_pages() == 3
    assert not eng.has_work()
    assert eng.requests[r0].output == partial  # partial output preserved
    # Cancel is idempotent and races completion gracefully.
    assert eng.cancel(r0) is False
    assert eng.cancel(r1) is False
    assert eng.cancel(12345) is False
    # A fresh request serves normally afterwards.
    r2 = eng.add_request(p0, 4)
    outs = eng.run()
    assert outs[r2] == reference_generate(params, cfg, p0, 4)
    # Cancelled requests don't resurrect through checkpoint/resume.
    snap = eng.state_dict()
    eng2 = Engine.from_state(snap, params, cfg, ccfg, EngineConfig(max_batch=4, pages_per_seq=3))
    assert eng2.requests[r0].state == "cancelled"
    assert not eng2.has_work()


# ── per-request sampling / stop conditions / streaming (round 3) ────────────


def _engine(tiny_model, **eng_kw):
    params, cfg = tiny_model
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    kw = dict(max_batch=4, pages_per_seq=8)
    kw.update(eng_kw)
    return Engine(params, cfg, ccfg, EngineConfig(**kw))


def test_per_request_sampling_batch_independent(tiny_model):
    """A seeded sampled request produces the SAME tokens whether it serves
    alone or alongside other requests (position-folded per-request keys),
    while a default-greedy peer in the same batch still matches the
    reference oracle."""
    from flashattention_tpu.runtime.engine import SamplingParams

    params, cfg = tiny_model
    sp = SamplingParams(greedy=False, temperature=0.9, top_k=5, seed=1234)
    prompt_a = [3, 1, 4, 1, 5, 9, 2, 6]
    prompt_b = [2, 7, 1, 8]

    solo = _engine(tiny_model)
    rid = solo.add_request(prompt_b, 6, sampling=sp)
    want_b = solo.run()[rid]

    eng = _engine(tiny_model)
    ra = eng.add_request(prompt_a, 6)
    rb = eng.add_request(prompt_b, 6, sampling=sp)
    outs = eng.run()
    assert outs[ra] == reference_generate(params, cfg, prompt_a, 6)
    assert outs[rb] == want_b


def test_per_request_stop_tokens_and_sequences(tiny_model):
    params, cfg = tiny_model
    from flashattention_tpu.runtime.engine import SamplingParams

    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    want = reference_generate(params, cfg, prompt, 6)

    stop_tok = want[2]
    stop_seq = tuple(want[1:4])
    # Expected: first emission index where the condition fires (the greedy
    # stream may repeat tokens, so compute it rather than assume index 2).
    n_tok = want.index(stop_tok) + 1
    n_seq = next(
        i + 1
        for i in range(len(want))
        if tuple(want[: i + 1][-len(stop_seq):]) == stop_seq
    )
    eng = _engine(tiny_model)
    r_tok = eng.add_request(
        prompt, 6, sampling=SamplingParams(stop_tokens=(stop_tok,))
    )
    r_seq = eng.add_request(
        prompt, 6, sampling=SamplingParams(stop_sequences=(stop_seq,))
    )
    outs = eng.run()
    assert outs[r_tok] == want[:n_tok]  # stops AT the first stop token
    assert outs[r_seq] == want[:n_seq]  # stops when the tail matches
    # Early finishes freed everything.
    assert not eng.has_work()
    assert eng.cache.num_free_pages() == eng.cache.config.num_pages


def test_streaming_callbacks(tiny_model):
    params, cfg = tiny_model
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    want = reference_generate(params, cfg, prompt, 5)
    seen, seen_engine, final_states = [], [], []

    def per_req(req, tok):
        seen.append(tok)
        final_states.append(req.state)

    eng = _engine(tiny_model)
    eng.on_token = lambda req, tok: seen_engine.append((req.req_id, tok))
    rid = eng.add_request(prompt, 5, on_token=per_req)
    eng.run()
    assert seen == want  # streamed in emission order
    assert seen_engine == [(rid, t) for t in want]
    # State is already updated when the callback fires: last call sees the
    # finished request.
    assert final_states[-1] == "finished"
    assert all(s == "running" for s in final_states[:-1])


def test_logprobs_recorded(tiny_model):
    """Greedy + logprobs: recorded values equal the reference log-softmax of
    each emitted token under the same context."""
    from flashattention_tpu.runtime.engine import SamplingParams

    params, cfg = tiny_model
    prompt = [2, 7, 1, 8, 2, 8]
    n_new = 4
    eng = _engine(tiny_model)
    rid = eng.add_request(
        prompt, n_new, sampling=SamplingParams(logprobs=True)
    )
    out = eng.run()[rid]
    req = eng.requests[rid]
    assert out == reference_generate(params, cfg, prompt, n_new)
    assert len(req.logprobs) == len(out)
    # Reference: recompute each step's log-softmax by full forward.
    toks = list(prompt)
    for tok, lp in zip(out, req.logprobs):
        s = len(toks)
        sb = 8
        while sb < s:
            sb *= 2
        padded = jnp.asarray(
            np.pad(np.asarray(toks, np.int32), (0, sb - s))[None]
        )
        logits, _, _ = transformer.prefill(params, padded, cfg=cfg)
        want_lp = float(
            jax.nn.log_softmax(logits[0, s - 1].astype(jnp.float32))[tok]
        )
        assert lp == pytest.approx(want_lp, abs=1e-4), (tok, lp, want_lp)
        toks.append(tok)


def test_sampling_params_survive_checkpoint(tiny_model):
    """Per-request params (incl. seeded streams) resume exactly: the resumed
    engine finishes the request with the same continuation the original
    would have produced."""
    from flashattention_tpu.runtime.engine import Engine as _E
    from flashattention_tpu.runtime.engine import SamplingParams

    params, cfg = tiny_model
    sp = SamplingParams(
        greedy=False, temperature=0.8, seed=7, stop_tokens=(99999,),
        logprobs=True,
    )
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    full = _engine(tiny_model)
    rid = full.add_request(prompt, 6, sampling=sp)
    want = full.run()[rid]

    eng = _engine(tiny_model)
    rid2 = eng.add_request(prompt, 6, sampling=sp)
    for _ in range(3):
        eng.step()
    snap = eng.state_dict()
    # Simulate JSON round-trip (tuples -> lists) like orbax/json storage.
    import json

    snap = json.loads(json.dumps(snap))
    ccfg = CacheConfig(
        num_layers=cfg.num_layers,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        page_size=8,
        num_pages=64,
        dtype="float32",
    )
    eng2 = _E.from_state(
        snap, params, cfg, ccfg,
        EngineConfig(max_batch=4, pages_per_seq=8),
    )
    out = eng2.run()[rid2]
    assert out == want
    assert len(eng2.requests[rid2].logprobs) == len(out)


def test_mixed_params_multi_step_falls_back(tiny_model):
    """multi_step with a custom-params request silently uses the per-token
    path and still matches the oracle."""
    from flashattention_tpu.runtime.engine import SamplingParams

    params, cfg = tiny_model
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    eng = _engine(tiny_model)
    rid = eng.add_request(prompt, 6, sampling=SamplingParams(greedy=True))
    out = eng.run(multi_step=4)[rid]
    assert out == reference_generate(params, cfg, prompt, 6)


def test_cancel_from_streaming_callback(tiny_model):
    """A streaming callback cancelling requests mid-batch (the client-
    disconnect pattern): the cancelled request stops exactly at the cancel
    point, surplus same-step tokens are discarded, no state corruption."""
    params, cfg = tiny_model
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    want = reference_generate(params, cfg, prompt, 8)

    # Self-cancel after 3 tokens during multi-token scheduling.
    eng = _engine(tiny_model)

    def stop_after_3(req, tok):
        if len(req.output) == 3:
            eng.cancel(req.req_id)

    rid = eng.add_request(prompt, 8, on_token=stop_after_3)
    eng.run(multi_step=4)
    req = eng.requests[rid]
    assert req.state == "cancelled"
    assert req.output == want[:3]
    assert eng.cache.num_free_pages() == eng.cache.config.num_pages
    assert not eng.has_work()

    # A callback on one request cancelling a PEER in the same decode batch.
    eng2 = _engine(tiny_model)
    ra = eng2.add_request(prompt, 6)
    rb = eng2.add_request([2, 7, 1, 8], 6)
    eng2.requests[ra].on_token = lambda req, tok: (
        eng2.cancel(rb) if len(req.output) == 2 else None
    )
    outs = eng2.run()
    assert outs[ra] == want[:6]
    assert eng2.requests[rb].state == "cancelled"
    # Peer keeps only what was emitted before the cancel fired.
    assert len(outs[rb]) <= 2
    assert eng2.cache.num_free_pages() == eng2.cache.config.num_pages

    # Self-cancel during speculative decoding.
    eng3 = _engine(tiny_model)

    def stop3(req, tok):
        if len(req.output) == 2:
            eng3.cancel(req.req_id)

    r3 = eng3.add_request(prompt, 8, on_token=stop3)
    eng3.run_speculative(lambda req, n: [0] * n, k=3)
    assert eng3.requests[r3].state == "cancelled"
    assert eng3.requests[r3].output == want[:2]
    assert eng3.cache.num_free_pages() == eng3.cache.config.num_pages
