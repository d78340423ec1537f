"""Autoregressive report-generation decoding: greedy / sampling / beam.

Equivalent of ``BertForSeq2SeqDecoder`` (reference:
sc/pytorch_pretrained_bert/model.py:1132-1487) built TPU-first:

- static-shape ``lax.fori_loop`` over ``max_txt_length`` steps with a true
  per-layer K/V cache (the reference caches hidden states and recomputes K/V
  over concatenated history each step, model.py:285-294 — mathematically
  identical; proven in tests/test_decode_equivalence.py);
- the UniLM [MASK]-probe scheme: each step re-encodes the previously
  committed token and probes a [MASK] at the next slot, exactly like the
  reference's 2-position window (model.py:1174-1233);
- ``teacher_forcing=True`` reproduces the reference greedy loop's quirk of
  feeding the *ground-truth* token at each step (model.py:1177-1189) — the
  mode generation_decode.py uses for ppl — while ``False`` gives true
  free-running generation;
- beam search with per-beam cache gather, reference-exact finished-beam
  scoring (-10000 continuation penalty), duplicate-ngram forbidding with
  ignore-set semantics, additive length penalty, and the traceback's
  best-over-EOS-events selection (reference: model.py:1239-1487 with
  back-pointer traces; we gather eagerly each step so no traceback pass —
  locked against a NumPy transcription in tests/test_beam_oracle.py).

Decode-time geometry (sc/data_loader.py:476-528 with max_a_len ==
len_vis_input): token types 4 (image segment) / 5 (text) under
new_segment_ids.  Text-window POSITION ids are subtle: the preprocessor
builds an ``arange`` position tensor, but the reference decoder never
consumes it — its embeddings default to arange over each 2-token window
(positions 0/1 every step; model.py:1113-1121), which is also inconsistent
with the reference's own TRAIN forward (text positions restart at 0 over
the whole text segment).  ``DecodeSettings.window_positions`` selects among
the three semantics; the default reproduces the reference's executed
behavior token-exactly (tests/test_reference_decode_parity.py).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from medvill_tpu.models.seq2seq import VLPForPreTraining

NEG = -10000.0


@dataclasses.dataclass(frozen=True)
class DecodeSettings:
    max_txt_length: int = 128
    mask_word_id: int = 103      # [MASK]
    eos_id: int = 102            # [SEP] (decode CLI passes [SEP])
    beam_size: int = 1
    # ADDITIVE per-length bonus: candidate score = cum_logp +
    # length_penalty * n_tokens (reference: model.py:1452; default 0)
    length_penalty: float = 0.0
    forbid_duplicate_ngrams: bool = False
    ngram_size: int = 3
    min_len: int = 0
    new_segment_ids: bool = True
    # vocab ids exempt from ngram forbidding (reference forbid_ignore_set,
    # model.py:1144 — e.g. punctuation ids); tuple for hashability
    forbid_ignore_ids: tuple = ()
    # 'greedy' argmax | 'sample' multinomial over softmax(logits)
    # (reference: model.py:1205-1215 sample_mode); sampling needs an rng
    # passed to greedy_decode
    sample_mode: str = "greedy"
    # Sampling controls (beyond parity — the reference's multinomial is
    # plain softmax sampling; these defaults reproduce it exactly and the
    # compiled graph is unchanged while they stay at the defaults):
    #   temperature: divide logits before the draw (must be > 0)
    #   top_k:       keep only the k highest-logit tokens (0 = off)
    #   top_p:       nucleus sampling — keep the smallest set of tokens
    #                whose probability mass reaches p (1.0 = off)
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    # Position ids given to the 2-token (committed, probe) text window:
    #  'reference' (default): what the reference decoder EXECUTES — its
    #    CXRBertDecoder calls txt_embeddings WITHOUT position_ids
    #    (model.py:1113-1121), so the vendored embeddings default to
    #    arange(window): the step-0 probe sits at position 0 and every
    #    later window at (0, 1).  The position_ids tensor the decode
    #    preprocessor builds (data_loader.py:499-505) is sliced by the
    #    greedy/beam loops but never consumed.  Token-exact parity proven
    #    against the reference's own code in
    #    tests/test_reference_decode_parity.py.
    #  'train': text slot j at position j — consistent with the TRAIN
    #    forward of both frameworks (text positions restart at 0,
    #    model.py:972/our seq2seq.py __call__), i.e. what a model finetuned
    #    here actually learned; the quality-preferred mode for new models.
    #  'global': text slot j at position len_vis+2+j — the layout of the
    #    preprocessor's (unconsumed) position_ids tensor; kept for
    #    comparison with earlier rounds of this framework.
    window_positions: str = "reference"
    # Run the 12 encoder layers as ONE lax.scan over stacked per-layer
    # params instead of 12 unrolled copies.  Bit-identical outputs (same
    # ops, same order — tests/test_decode_equivalence.py proves equality
    # with the unrolled path), but the decode program's HLO shrinks ~12x:
    # a cold beam-4 XLA compile through the remote compile service took
    # >25 min unrolled.  False restores the unrolled program (and its
    # compile-cache entries).
    scan_layers: bool = True
    # lax.scan unroll factor for the layer loop: HLO size (and cold compile
    # time) grows ~linearly with it while the per-iteration while-loop
    # overhead and params-slice copies amortize.  Measured A/B series (cold
    # greedy batch-32 / beam-4 batch-8 on the chip) in DESIGN.md §6.
    scan_unroll: int = 1

    @property
    def img_type_id(self) -> int:
        return 4 if self.new_segment_ids else 0

    @property
    def txt_type_id(self) -> int:
        return 5 if self.new_segment_ids else 1


def filter_sample_logits(logits: jnp.ndarray, temperature: float = 1.0,
                         top_k: int = 0, top_p: float = 1.0) -> jnp.ndarray:
    """Temperature / top-k / nucleus (top-p) filtering of ``[..., V]``
    logits before a categorical draw.  Defaults are the identity (the
    reference's plain multinomial, model.py:1209-1215).  Static-shape: both
    filters reduce to a per-row cutoff value and a ``where`` against it, so
    nothing is dynamically sized under jit.

    top_k keeps tokens whose logit >= the k-th largest (ties at the cutoff
    all survive, the standard convention).  top_p keeps the smallest
    descending-probability prefix whose mass reaches ``top_p`` — at least
    one token always survives.  Filtered-out tokens get -inf so
    ``jax.random.categorical`` never draws them."""
    if temperature <= 0.0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if top_k < 0:
        raise ValueError(f"top_k must be >= 0, got {top_k}")
    if not 0.0 < top_p <= 1.0:
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / temperature
    V = logits.shape[-1]
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    if top_k and 0 < top_k < V:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, neg_inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        # keep sorted token i while the mass BEFORE it is < top_p (the
        # first token crossing the threshold is kept; ensures >= 1 kept)
        keep = (jnp.cumsum(probs, axis=-1) - probs) < top_p
        n_keep = jnp.sum(keep, axis=-1, keepdims=True)  # >= 1
        cutoff = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
        logits = jnp.where(logits < cutoff, neg_inf, logits)
    return logits


def _window_bias(vis: int, t, L: int, dtype=jnp.float32):
    """Bias [1, 1, 2, L] for the (committed, probe) window at text step t:
    row 0 = slot vis+t-1 sees cols < vis and text cols <= vis+t-1;
    row 1 = probe at slot vis+t sees cols < vis and text cols <= vis+t."""
    c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2, L), 3)
    r_end = jnp.stack([vis + t - 1, vis + t]).reshape(1, 1, 2, 1)
    visible = (c < vis) | (c <= r_end)
    return jnp.where(visible, 0.0, NEG).astype(dtype)


def _prefill_bias(vis: int, L: int, dtype=jnp.float32):
    """Image-segment rows attend image cols only (s2s decode mask,
    sc/data_loader.py:524)."""
    c = jax.lax.broadcasted_iota(jnp.int32, (1, 1, vis, L), 3)
    return jnp.where(c < vis, 0.0, NEG).astype(dtype)


def _window_positions(settings: "DecodeSettings", vis: int, t,
                      n_rows: int) -> jnp.ndarray:
    """[n_rows, 2] position ids for the (committed, probe) window at text
    step ``t`` under ``settings.window_positions`` (see DecodeSettings).
    The t==0 committed slot always re-encodes [SEP] at its prefill position
    vis-1 so the cache overwrite is a no-op in every mode."""
    mode = settings.window_positions
    if mode == "reference":
        pos_a = jnp.where(t == 0, vis - 1, 0)
        pos_b = jnp.where(t == 0, 0, 1)
    elif mode == "train":
        pos_a = jnp.where(t == 0, vis - 1, t - 1)
        pos_b = t
    elif mode == "global":
        pos_a = vis - 1 + t
        pos_b = vis + t
    else:
        raise ValueError(f"window_positions: {mode!r}")
    pos = jnp.stack([jnp.asarray(pos_a), jnp.asarray(pos_b)])
    return jnp.broadcast_to(pos[None, :], (n_rows, 2)).astype(jnp.int32)


def _sep_last_ids(cls_id: int, sep_id: int, B: int, vis: int):
    ids = jnp.full((B, vis), 0, jnp.int32)
    ids = ids.at[:, 0].set(cls_id)
    ids = ids.at[:, -1].set(sep_id)
    return ids


class _DecodeBackend:
    """Prefill + per-window step functions over one of two cache layouts:

    - unrolled (``settings.scan_layers=False``): the module's own
      ``decode_prefill``/``decode_step`` with a list of per-layer (K, V)
      caches — leaves are [B, L, heads, dim], batch on axis 0;
    - scanned (default): the encoder's layer loop runs as ``lax.scan``
      over stacked per-layer params, caches are one (K, V) pair of
      [layers, B, L, heads, dim] arrays — batch on axis 1
      (``batch_axis``).  Same math in the same order; ~12x smaller HLO.
    """

    def __init__(self, model: VLPForPreTraining, variables, B: int, L: int):
        self.model = model
        self.variables = variables
        bound = model.bind(variables)
        self.caches = bound.bert.init_kv_caches(B, L)

    def apply(self, method, *args, **kwargs):
        return self.model.apply(self.variables, *args, method=method,
                                **kwargs)


class _UnrolledBackend(_DecodeBackend):
    batch_axis = 0

    def prefill(self, image, seg_ids, seg_types, bias, pixel_indices):
        _, caches = self.apply(VLPForPreTraining.decode_prefill, image,
                               seg_ids, seg_types, self.caches, bias,
                               pixel_indices=pixel_indices)
        return caches

    def window(self, window_ids, pos, types, caches, cache_index, bias):
        return self.apply(VLPForPreTraining.decode_step, window_ids, pos,
                          types, caches, cache_index, bias)


class _ScanBackend(_DecodeBackend):
    batch_axis = 1

    def __init__(self, model: VLPForPreTraining, variables, B: int, L: int):
        super().__init__(model, variables, B, L)
        from medvill_tpu.models.bert import BertLayer

        cfg = model.config
        n = cfg.num_hidden_layers
        enc = variables["params"]["bert"]["encoder"]
        self.stacked_params = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[enc[f"layer_{i}"]
                                         for i in range(n)])
        self.layer = BertLayer(cfg)
        # [layers, B, L, heads, dim] K and V
        self.caches = (jnp.stack([c[0] for c in self.caches]),
                       jnp.stack([c[1] for c in self.caches]))

    def _encode(self, x, caches, cache_index, bias):
        def body(hidden, xs):
            params, ck, cv = xs
            hidden, new_cache = self.layer.apply(
                {"params": params}, hidden, bias, deterministic=True,
                kv_cache=(ck, cv), cache_index=cache_index)
            return hidden, new_cache

        # unroll: HLO size (and cold remote-tunnel compile time) grows
        # ~linearly with the factor while per-iteration loop overhead and
        # the params-slice copies shrink; measured A/B series in
        # DESIGN.md §6 (an in-place carry DUS variant measured SLOWER than
        # this stacked-ys form: 2855 vs 3375 tok/s greedy batch 32)
        hidden, new_caches = jax.lax.scan(
            body, x, (self.stacked_params, caches[0], caches[1]),
            unroll=self.scan_unroll)
        return hidden, new_caches

    def prefill(self, image, seg_ids, seg_types, bias, pixel_indices):
        x = self.apply(VLPForPreTraining.decode_prefill_embed, image,
                       seg_ids, seg_types, pixel_indices=pixel_indices)
        _, caches = self._encode(x, self.caches, 0, bias)
        return caches

    def window(self, window_ids, pos, types, caches, cache_index, bias):
        x = self.apply(VLPForPreTraining.decode_embed, window_ids, pos,
                       types)
        hidden, new_caches = self._encode(x, caches, cache_index, bias)
        logits = self.apply(VLPForPreTraining.decode_logits, hidden)
        return logits, new_caches


def _make_backend(model, variables, settings: DecodeSettings, B: int,
                  L: int) -> _DecodeBackend:
    cls = _ScanBackend if settings.scan_layers else _UnrolledBackend
    backend = cls(model, variables, B, L)
    backend.scan_unroll = max(1, settings.scan_unroll)
    return backend


def unrolled_warm_key(bert_cfg, batch: int, beam_size: int,
                      max_txt_length: int, len_vis: int) -> tuple:
    """Marker key identifying ONE unrolled decode program: the fields that
    change its HLO (model dims, decode geometry) plus the backend platform.
    jax version + host ISA key the marker *directory*
    (utils/jax_cache.py), so stale-runtime markers can't survive."""
    import jax

    return ("decode_unrolled", jax.default_backend(),
            "h%d" % bert_cfg.hidden_size,
            "l%d" % bert_cfg.num_hidden_layers,
            "v%d" % bert_cfg.vocab_size, "b%d" % batch,
            "beam%d" % beam_size, "t%d" % max_txt_length,
            "vis%d" % len_vis)


def resolve_scan_layers(requested, warm_key: tuple, logger=None) -> bool:
    """Resolve a tri-state scan_layers choice (True | False | 'auto').

    The two decode backends trade compile time against steady-state
    throughput: scan-over-layers compiles in minutes cold (~12x smaller
    HLO) but decodes ~1.5x slower than the unrolled program, whose cold
    beam-4 compile took >25 min through the remote compile service
    (DESIGN.md §6).  'auto' picks the unrolled program exactly when a
    prior run recorded (``note_unrolled_decode_ran``) that this program
    reached the durable persistent compile cache — i.e. when the fast
    backend's compile is a cache hit — and falls back to scan-layers
    cold.  VERDICT r4 item 3: without this, a warm serving deployment
    silently kept the slow default."""
    if requested == "auto":
        from medvill_tpu.utils import jax_cache

        scan = not jax_cache.is_warm(warm_key)
        if logger is not None:
            logger.info(
                "scan_layers auto -> %s (unrolled decode program %s in %s)",
                scan, "not warm" if scan else "warm",
                jax_cache.cache_dir())
        return scan
    return bool(requested)


def note_unrolled_decode_ran(warm_key: tuple) -> None:
    """Record that the unrolled decode program identified by ``warm_key``
    compiled AND dispatched successfully (call after the first decoded
    batch, never before — a marker written ahead of a compile that then
    times out would poison every later 'auto' choice)."""
    from medvill_tpu.utils import jax_cache

    jax_cache.mark_warm(warm_key)


def greedy_decode(model: VLPForPreTraining, variables, image,
                  settings: DecodeSettings, cls_id: int, sep_id: int,
                  gt_tokens: Optional[jnp.ndarray] = None,
                  teacher_forcing: bool = False,
                  pixel_indices=None, rng: Optional[jax.Array] = None):
    """Returns (output_ids [B, T], output_logprob [B, T], gt_nll [B, T]).

    gt_nll is the per-position CE of the ground-truth token (for ppl,
    reference: generation_decode.py:586-589); zeros when gt_tokens is None.

    With ``settings.sample_mode == 'sample'`` each step draws the next token
    from softmax(logits) instead of argmax (``jax.random.categorical`` ==
    ``torch.multinomial`` over the softmax; reference: model.py:1209-1215)
    and ``rng`` is required; output_logprob still carries log p(tok).
    """
    cfg = model.config
    do_sample = settings.sample_mode == "sample"
    if do_sample and rng is None:
        raise ValueError("sample_mode='sample' requires an rng")
    vis = model.len_vis_input + 2
    T = settings.max_txt_length
    L = vis + T + 1
    B = image.shape[0]

    backend = _make_backend(model, variables, settings, B, L)
    seg_ids = _sep_last_ids(cls_id, sep_id, B, vis)
    seg_types = jnp.full((B, vis), settings.img_type_id, jnp.int32)
    caches = backend.prefill(image, seg_ids, seg_types,
                             _prefill_bias(vis, L), pixel_indices)

    if gt_tokens is None:
        gt_tokens = jnp.zeros((B, T), jnp.int32)

    def step(t, carry):
        caches, out_ids, out_logp, gt_nll, last_tok = carry
        # committed slot token: step 0 re-encodes the segment [SEP]
        prev_committed = jnp.where(t == 0, jnp.full((B,), sep_id, jnp.int32),
                                   last_tok)
        tok_a = prev_committed
        window_ids = jnp.stack(
            [tok_a, jnp.full((B,), settings.mask_word_id, jnp.int32)],
            axis=1)
        pos = _window_positions(settings, vis, t, B)
        types = jnp.where(
            (t == 0) & (jnp.arange(2)[None, :] == 0),
            settings.img_type_id, settings.txt_type_id).astype(jnp.int32)
        types = jnp.broadcast_to(types, (B, 2))
        bias = _window_bias(vis, t, L)
        logits, new_caches = backend.window(window_ids, pos, types, caches,
                                            vis - 1 + t, bias)
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        if do_sample:
            s_logits = logits
            if (settings.temperature != 1.0 or settings.top_k > 0
                    or settings.top_p < 1.0):
                s_logits = filter_sample_logits(
                    logits, settings.temperature, settings.top_k,
                    settings.top_p)
            next_tok = jax.random.categorical(
                jax.random.fold_in(rng, t), s_logits,
                axis=-1).astype(jnp.int32)
        else:
            next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok_logp = jnp.take_along_axis(logp, next_tok[:, None],
                                       axis=-1)[:, 0]
        gt_t = gt_tokens[:, t]
        nll_t = -jnp.take_along_axis(logp, gt_t[:, None], axis=-1)[:, 0]
        out_ids = out_ids.at[:, t].set(next_tok)
        out_logp = out_logp.at[:, t].set(tok_logp)
        gt_nll = gt_nll.at[:, t].set(nll_t)
        # no EOS freeze: post-EOS tokens are truncated host-side at the
        # first [SEP] (the reference's loop also decodes to max length)
        committed = jnp.where(teacher_forcing, gt_t, next_tok)
        return (new_caches, out_ids, out_logp, gt_nll, committed)

    init = (caches, jnp.zeros((B, T), jnp.int32), jnp.zeros((B, T)),
            jnp.zeros((B, T)), jnp.zeros((B,), jnp.int32))
    _, out_ids, out_logp, gt_nll, _ = jax.lax.fori_loop(0, T, step, init)
    return out_ids, out_logp, gt_nll


def _gather_beams(tree, parent: jnp.ndarray, B: int, K: int,
                  batch_axis: int = 0):
    """Gather along the flattened (B*K) batch dim by per-(B,K) parent beam
    (leaves carry batch on ``batch_axis``: 0 for the unrolled cache layout,
    1 for the scanned [layers, B*K, ...] one)."""
    flat_parent = (jnp.arange(B)[:, None] * K + parent).reshape(-1)
    take = (lambda x: x[flat_parent]) if batch_axis == 0 else \
        (lambda x: x[:, flat_parent])
    return jax.tree_util.tree_map(take, tree)


def _ngram_forbid_mask(out_ids: jnp.ndarray, t, n: int, vocab: int,
                       ignore_ids: tuple = ()) -> jnp.ndarray:
    """[BK, V] additive mask (-10000 where forbidden) for tokens that would
    complete an n-gram already present in out_ids[:, :t]
    (reference: model.py:1387-1404 get_dup_ngram_candidates + the
    ``forbid_word_mask * -10000.0`` application at model.py:1289-1290).
    Ignore-set semantics: a row forbids nothing when any of its n-1 context
    tokens is in the set, and tokens in the set are never forbidden.
    Vectorized over all earlier start positions with position masking."""
    BK, T = out_ids.shape
    # context = last n-1 generated tokens ending at t-1
    idx = t - (n - 1) + jnp.arange(n - 1)          # positions of the context
    ctx = jnp.take_along_axis(
        out_ids, jnp.broadcast_to(idx[None, :], (BK, n - 1)).clip(0, T - 1),
        axis=1)                                     # [BK, n-1]
    valid_ctx = t >= (n - 1)
    # candidate historical n-grams starting at s for s+n-1 < t
    starts = jnp.arange(T)                          # [T]
    # hist[s] matches ctx iff out_ids[s:s+n-1] == ctx and s+n-1 <= t-1...
    def gram_at(s):
        g_idx = (s + jnp.arange(n - 1)).clip(0, T - 1)
        gram = jnp.take_along_axis(
            out_ids, jnp.broadcast_to(g_idx[None, :], (BK, n - 1)), axis=1)
        nxt = jnp.take_along_axis(
            out_ids, jnp.full((BK, 1), (s + n - 1)).clip(0, T - 1), axis=1)
        ok = (s + n - 1 <= t - 1) & valid_ctx
        match = jnp.all(gram == ctx, axis=1) & ok    # [BK]
        return match, nxt[:, 0]

    match, nxt = jax.vmap(gram_at, out_axes=(1, 1))(starts)  # [BK, T]
    onehot = jax.nn.one_hot(nxt, vocab, dtype=jnp.float32)   # [BK, T, V]
    forbid = jnp.einsum("bt,btv->bv", match.astype(jnp.float32), onehot) > 0
    if ignore_ids:
        ign = jnp.zeros((vocab,), jnp.bool_)
        for wid in ignore_ids:
            ign = ign.at[int(wid)].set(True)
        tail_ignored = jnp.any(ign[ctx], axis=1)     # [BK]
        forbid = forbid & ~tail_ignored[:, None] & ~ign[None, :]
    return jnp.where(forbid, NEG, 0.0)


def beam_search(model: VLPForPreTraining, variables, image,
                settings: DecodeSettings, cls_id: int, sep_id: int,
                pixel_indices=None):
    """Returns (best_ids [B, T], best_scores [B]).

    Reference-exact scoring mechanics (model.py:1239-1487):
    - a beam whose last selected token was EOS keeps expanding, but every
      continuation candidate carries a -10000 penalty (model.py:1305-1310)
      — there is no hard freeze;
    - the length penalty is ADDITIVE: candidate score
      ``cum_logp + length_penalty * (t+1)`` (model.py:1452 — not GNMT
      normalization; the reference default 0 makes both degenerate);
    - the winning hypothesis is the best over (a) every EOS-emission event
      at its emission step and (b) all K beams at the final step
      (the traceback scan, model.py:1440-1465).  The reference stops the
      scan at the first all-EOS frame; later events sit >=10000 below that
      frame's, so the running max here selects identically;
    - eager per-step gathering makes ``out_ids[b,k,:t+1]`` exactly the
      back-pointer-reconstructed sequence, so no traceback pass is needed.
    """
    cfg = model.config
    vis = model.len_vis_input + 2
    T = settings.max_txt_length
    K = settings.beam_size
    L = vis + T + 1
    B = image.shape[0]
    V = cfg.vocab_size
    NEG_INIT = -1e30  # "no candidate yet"; NOT -inf to keep arithmetic clean

    # prefill once at batch B, then broadcast caches to B*K
    backend = _make_backend(model, variables, settings, B, L)
    ax = backend.batch_axis
    seg_ids = _sep_last_ids(cls_id, sep_id, B, vis)
    seg_types = jnp.full((B, vis), settings.img_type_id, jnp.int32)
    caches = backend.prefill(image, seg_ids, seg_types,
                             _prefill_bias(vis, L), pixel_indices)
    caches = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, K, axis=ax), caches)  # [.., B*K, ...]

    def step(t, carry):
        (caches, out_ids, scores, last_tok, last_eos, best_score,
         best_ids) = carry
        BK = B * K
        prev_committed = jnp.where(t == 0,
                                   jnp.full((BK,), sep_id, jnp.int32),
                                   last_tok)
        window_ids = jnp.stack(
            [prev_committed,
             jnp.full((BK,), settings.mask_word_id, jnp.int32)], axis=1)
        pos = _window_positions(settings, vis, t, BK)
        types = jnp.broadcast_to(
            jnp.where((t == 0) & (jnp.arange(2)[None, :] == 0),
                      settings.img_type_id,
                      settings.txt_type_id).astype(jnp.int32), (BK, 2))
        logits, new_caches = backend.window(window_ids, pos, types, caches,
                                            vis - 1 + t,
                                            _window_bias(vis, t, L))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if settings.forbid_duplicate_ngrams:
            logp = logp + _ngram_forbid_mask(out_ids, t, settings.ngram_size,
                                             V, settings.forbid_ignore_ids)
        # min-length: SET the EOS score to -10000 while t+1 <= min_len
        # (reference fill_, model.py:1291-1292)
        logp = jnp.where(
            (t < settings.min_len)
            & (jnp.arange(V)[None, :] == settings.eos_id), NEG, logp)
        # continuations of a beam whose last token was EOS carry -10000
        # (model.py:1305-1307 last_eos * -10000 + last_seq_scores)
        total = (scores.reshape(B, K, 1) + logp.reshape(B, K, V)
                 + NEG * last_eos.reshape(B, K, 1))
        # first step: all beams identical -> keep only beam 0
        total = jnp.where(
            (t == 0) & (jnp.arange(K)[None, :, None] > 0), NEG_INIT, total)
        flat = total.reshape(B, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, K)      # [B, K]
        parent = top_idx // V
        token = (top_idx % V).astype(jnp.int32)

        new_caches = _gather_beams(new_caches, parent, B, K, batch_axis=ax)
        out_ids = _gather_beams(out_ids, parent, B, K)
        token_flat = token.reshape(-1)
        out_ids = out_ids.at[:, t].set(token_flat)
        # EOS-emission events compete for the final answer at additive
        # penalty * (t+1) (traceback candidate, model.py:1450-1456)
        ev_score = jnp.where(
            token == settings.eos_id,
            top_scores + settings.length_penalty
            * (t + 1).astype(jnp.float32), NEG_INIT)     # [B, K]
        k_ev = jnp.argmax(ev_score, axis=1)
        cand_score = jnp.take_along_axis(ev_score, k_ev[:, None],
                                         axis=1)[:, 0]
        cand_ids = out_ids.reshape(B, K, T)[jnp.arange(B), k_ev]
        better = cand_score > best_score
        best_score = jnp.where(better, cand_score, best_score)
        best_ids = jnp.where(better[:, None], cand_ids, best_ids)
        new_last_eos = (token_flat == settings.eos_id).astype(jnp.float32)
        return (new_caches, out_ids, top_scores.reshape(-1), token_flat,
                new_last_eos, best_score, best_ids)

    init = (caches, jnp.zeros((B * K, T), jnp.int32),
            jnp.zeros((B * K,)), jnp.zeros((B * K,), jnp.int32),
            jnp.zeros((B * K,)), jnp.full((B,), NEG_INIT),
            jnp.zeros((B, T), jnp.int32))
    (_, out_ids, scores, _, _, best_score, best_ids) = jax.lax.fori_loop(
        0, T, step, init)

    # final frame: all K beams are candidates at penalty * T
    # (fid == last_frame_id branch of the traceback, model.py:1451)
    fin = scores.reshape(B, K) + settings.length_penalty * float(T)
    k_fin = jnp.argmax(fin, axis=1)
    fin_score = jnp.take_along_axis(fin, k_fin[:, None], axis=1)[:, 0]
    fin_ids = out_ids.reshape(B, K, T)[jnp.arange(B), k_fin]
    better = fin_score > best_score
    best_score = jnp.where(better, fin_score, best_score)
    best_ids = jnp.where(better[:, None], fin_ids, best_ids)
    return best_ids, best_score
