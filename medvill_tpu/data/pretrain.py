"""Pretraining data pipeline: JSONL -> numpy batches of (ids, labels, spec).

Equivalent of ``CXRDataset`` (reference: data/dataset_origin.py:25-235) with
one structural change: instead of materializing the ``[L, L]`` attention mask
per sample, each example carries a 2-int spec ``(variant, txt_len)`` that the
device realizes analytically (see medvill_tpu/data/masks.py).

Example JSONL schema (reference: dataset_origin.py:211-216):
``{"id": ..., "split": ..., "label": ..., "text": ..., "img": ...}``.
"""
from __future__ import annotations

import json
import os
import random
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from medvill_tpu.core.config import MaskVariant, PretrainConfig
from medvill_tpu.data import images as image_lib
from medvill_tpu.data.sampling import random_pair_sampling, random_word, truncate_txt
from medvill_tpu.data.tokenization import BertTokenizer


class CXRPretrainDataset:
    """Per-example processing; indexable like the torch Dataset."""

    def __init__(self, data_path_or_records, tokenizer: BertTokenizer,
                 cfg: PretrainConfig, seed: int = 0,
                 image_loader=None):
        if isinstance(data_path_or_records, str):
            self.data_dir = os.path.dirname(data_path_or_records)
            with open(data_path_or_records) as f:
                self.data = [json.loads(l) for l in f]
        else:
            self.data_dir = ""
            self.data = list(data_path_or_records)
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.seq_len = cfg.seq_len
        self.num_image_embeds = cfg.image.num_image_embeds
        self.total_len = cfg.total_len
        self.vocab = tokenizer.vocab
        self.vocab_len = len(self.vocab)
        self.rng = random.Random(seed)
        self.image_loader = image_loader or self._default_image_loader

        self.static_variant = cfg.resolve_variant()  # None => Mixed

    def _default_image_loader(self, img_path: str) -> np.ndarray:
        return image_lib.load_image(
            os.path.join(self.data_dir, img_path), self.cfg.image.img_size,
            channels=self.cfg.image.img_channel,
            # 512 path skips resize in the reference (helper.py:19-27);
            # dataset images are already 512
            do_resize=(self.cfg.image.img_size == 224))

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.fetch(idx)

    def fetch(self, idx: int, rng: Optional[random.Random] = None,
              load_image: bool = True) -> "Dict[str, np.ndarray] | None":
        """Like ``__getitem__`` but with an optional per-sample RNG override
        (used by ``BatchLoader(workers>1)`` so parallel fetches stay
        deterministic; ``None`` draws from the shared sequential stream —
        the mode the RNG-parity tests pin down).

        ``load_image=False`` is the mid-epoch-resume replay path
        (``BatchLoader.skip_next`` with ``workers=1``): it consumes the
        IDENTICAL shared-stream RNG draws as a real fetch — pair sampling,
        whole-word masking, mask-variant choice — but skips the image IO
        (which consumes no RNG) and returns ``None``, so a resumed run's
        remaining samples are bit-exact vs an uninterrupted epoch."""
        rng = rng or self.rng
        origin_txt, img_path, is_aligned, _itm_prob = random_pair_sampling(
            idx, self.data, rng)

        encoded = self.tokenizer.tokenize_to_ids(origin_txt)
        truncate_txt(encoded, self.seq_len)

        input_ids, txt_labels = random_word(encoded, self.vocab_len,
                                            self.vocab["[MASK]"], rng)

        # [SEP] append + label layout (reference: dataset_origin.py:104-126;
        # the disturbing branch adds a leading -100 for the extra text-CLS)
        input_ids = input_ids + [self.vocab["[SEP]"]]
        if self.cfg.disturbing_mask:
            txt_labels_t = [-100] + txt_labels + [-100]
        else:
            txt_labels_t = txt_labels + [-100]
        txt_labels_i = [-100] * (self.num_image_embeds + 2)

        txt_len = len(input_ids)  # valid text positions incl. [SEP]
        pad_id = self.vocab["[PAD]"]
        n_pad = self.seq_len - txt_len + 1
        input_ids = input_ids + [pad_id] * n_pad
        txt_labels_t = txt_labels_t + [-100] * n_pad
        txt_labels_full = txt_labels_i + txt_labels_t

        segment = [1] * (self.seq_len + 1)  # reference: dataset_origin.py:129

        # mask spec
        if self.static_variant is None:
            # Mixed: per-sample weighted choice (dataset_origin.py:152-156)
            variant = (MaskVariant.FULL
                       if rng.random() < self.cfg.bi_prob else MaskVariant.S2S)
        else:
            variant = self.static_variant

        # all RNG draws are done; the image load consumes none (moved after
        # the draws so the replay path below skips only IO)
        if not load_image:
            return None
        image = self.image_loader(img_path)

        return dict(
            cls_tok=np.array([self.vocab["[CLS]"]], np.int32),
            input_txt=np.array(input_ids, np.int32),
            txt_labels=np.array(txt_labels_full, np.int32),
            mask_spec=np.array([int(variant), txt_len], np.int32),
            image=image_lib.as_wire_image(image),
            segment=np.array(segment, np.int32),
            is_aligned=np.int32(is_aligned),
            sep_tok=np.array([self.vocab["[SEP]"]], np.int32),
        )


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class BatchLoader:
    """Minimal epoch iterator with shuffling (reference: DataLoader,
    main_origin.py:52-54).  Drops the last partial batch to keep shapes
    static for XLA.

    Multi-host: pass ``num_shards=jax.process_count()`` /
    ``shard_index=jax.process_index()`` so each host iterates a disjoint
    slice of every (identically-shuffled) epoch — the DistributedSampler
    equivalent (reference: sc/finetune.py:285-288); batch_size is the
    per-host batch.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, num_shards: int = 1, shard_index: int = 0,
                 workers: int = 1, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.num_shards = num_shards
        self.shard_index = shard_index
        # drop_last=True (default) keeps every batch the same static shape —
        # the jitted+sharded train step compiles once and tail batches can't
        # break mesh divisibility.  Eval loaders whose consumers place with
        # plain jnp.asarray pass drop_last=False so metrics cover EVERY
        # example like the reference's eval DataLoaders (torch default
        # drop_last=False) — e.g. the retrieval pools, where a dropped tail
        # silently discards the final query from Hit@K/MRR.
        self.drop_last = drop_last
        if not drop_last and num_shards > 1:
            # per-shard ceil can differ across shards (9 samples, 2 shards,
            # batch 4 -> 2 vs 1 batches): a sharded step/collective on the
            # extra batch would deadlock the hosts that already exited
            raise ValueError(
                "drop_last=False with num_shards>1 can yield unequal batch "
                "counts across hosts; run full-coverage eval unsharded or "
                "use drop_last=True for sharded loops")
        # workers>1 fetches the samples of each batch through a thread pool
        # — the DataLoader(num_workers=N) equivalent (main_origin.py:52-54).
        # The hot per-sample ops (PIL JPEG decode, the native wordpiece
        # ctypes call) release the GIL, so threads scale without fork
        # overhead.  Stochastic datasets expose ``fetch(idx, rng)``; with
        # workers>1 each sample gets an RNG derived from (seed, epoch, idx),
        # so epochs are bit-reproducible for ANY worker count (stronger than
        # the reference's per-worker DataLoader seeding, whose stream depends
        # on num_workers).  workers=1 draws from the dataset's shared
        # sequential stream — the mode the RNG-parity tests pin down.
        self.workers = workers
        self._pool = None
        self._skip = 0

    def skip_next(self, n_batches: int) -> None:
        """Skip the first ``n_batches`` of the NEXT iteration only —
        mid-epoch resume after preemption (utils/preempt.py).  The shuffle
        order is a pure function of (seed, epoch), so the remaining batches
        are identical to an uninterrupted epoch's tail; with ``workers>1``
        over a ``fetch(idx, rng)`` dataset the sample contents are too
        (per-sample RNG derives from (seed, epoch, idx)).  With
        ``workers=1`` the shared sequential RNG stream is replayed for the
        skipped samples via ``fetch(idx, load_image=False)`` — identical
        draws, no image IO — so resume is bit-exact there too (replay cost:
        re-tokenizing the skipped prefix, ~ms per thousand samples on the
        native wordpiece path).  Datasets without that keyword fall back to
        position-only skip (valid, not bit-identical)."""
        self._skip = int(n_batches)

    def __len__(self) -> int:
        if self.drop_last:
            # global floor, NOT per-shard: every host shard must yield the
            # SAME number of batches or multi-host collectives deadlock
            return len(self.dataset) // (self.batch_size * self.num_shards)
        shard_len = len(range(self.shard_index, len(self.dataset),
                              self.num_shards))
        return -(-shard_len // self.batch_size)

    def _fetch(self, idxs) -> List[Dict[str, np.ndarray]]:
        if self.workers > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(self.workers)
            fetch = getattr(self.dataset, "fetch", None)
            if fetch is not None:
                # per-sample derived RNG: deterministic under any thread
                # scheduling / worker count (str seeds hash via sha512,
                # stable across processes)
                epoch = self.epoch
                return list(self._pool.map(
                    lambda j: fetch(int(j), random.Random(
                        f"{self.seed}/{epoch}/{int(j)}")), idxs))
            return list(self._pool.map(
                lambda j: self.dataset[int(j)], idxs))
        return [self.dataset[int(j)] for j in idxs]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        self.epoch += 1
        if self.num_shards > 1:
            order = order[self.shard_index::self.num_shards]
        B = self.batch_size
        start, self._skip = self._skip, 0
        if start and self.workers <= 1:
            # workers=1 draws from the dataset's SHARED sequential RNG
            # stream; replay the skipped samples' draws (image IO skipped)
            # so the resumed tail is bit-exact vs an uninterrupted epoch.
            # workers>1 needs no replay: per-sample RNG is (seed,epoch,idx).
            fetch = getattr(self.dataset, "fetch", None)
            if fetch is not None:
                import inspect

                try:
                    replayable = ("load_image"
                                  in inspect.signature(fetch).parameters)
                except (TypeError, ValueError):
                    replayable = False
                if replayable:
                    for j in order[:start * B]:
                        fetch(int(j), load_image=False)
        for i in range(start, len(self)):
            idxs = order[i * B:(i + 1) * B]
            yield collate(self._fetch(idxs))


def grouped_batches(loader, k: int):
    """Stack groups of k host batches into ``([k, B, ...] leaves, True)``
    for a k-micro-steps-per-dispatch scan; the (at most k-1) tail batches of
    an epoch are yielded individually as ``([B, ...], False)`` so short
    epochs (len(loader) < k) and epoch tails still train — via the
    single-step path — instead of being silently dropped."""
    import jax

    buf = []
    for b in loader:
        buf.append(b)
        if len(buf) == k:
            yield (jax.tree_util.tree_map(lambda *xs: np.stack(xs), *buf),
                   True)
            buf = []
    for b in buf:
        yield (b, False)


def dispatch_loader(loader, mesh, k: int, depth: int = 2):
    """The train CLIs' shared input pipeline: with ``k > 1``, stack groups
    of k host batches (``grouped_batches``) for the k-micro-steps-per-
    dispatch scan; either way, prefetch + device-place batches on a
    background thread so host preprocessing and transfer overlap the
    running step.  Yields ``(device_batch, is_group)`` — ``is_group``
    selects the multi- vs single-step jit variant (epoch tails and short
    epochs ride the single-step path)."""
    from medvill_tpu.core.mesh import shard_batch, shard_stacked_batch

    if k > 1:
        return PrefetchLoader(
            grouped_batches(loader, k), depth=depth,
            place_fn=lambda bg: (shard_stacked_batch(mesh, bg[0]) if bg[1]
                                 else shard_batch(mesh, bg[0]), bg[1]))
    return PrefetchLoader(loader, depth=depth,
                          place_fn=lambda b: (shard_batch(mesh, b), False))


class PrefetchLoader:
    """Wraps any batch iterable with a background-thread prefetch queue so
    host-side preprocessing (image decode, tokenization, masking) overlaps
    device execution — the TPU equivalent of the reference's
    ``DataLoader(num_workers=20)`` (reference: main_origin.py:52-54).
    Optionally device-puts each batch via ``place_fn`` while the previous
    step runs.
    """

    def __init__(self, loader, depth: int = 2, place_fn=None):
        self.loader = loader
        self.depth = depth
        self.place_fn = place_fn

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        END = object()
        err: List = []
        # consumer-abandonment protocol: a plain q.put would block the
        # producer forever when the consumer stops iterating early (break,
        # early-stop), leaking the thread plus depth+1 prefetched —
        # possibly device-placed — batches per abandoned epoch
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    pass
            return False

        def worker():
            try:
                for batch in self.loader:
                    # re-check after each fetch: a put that races the
                    # consumer's drain can succeed into the freed slot, and
                    # without this the worker would fetch AND device-place
                    # one more batch post-abandon
                    if stop.is_set():
                        return
                    if self.place_fn is not None:
                        batch = self.place_fn(batch)
                    if not put(batch):
                        return
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                put(END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is END:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # runs on GeneratorExit too: release the producer and drop any
            # queued batches so their (device) buffers free promptly
            stop.set()

            def drain():
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass

            drain()
            # one racing put can land in the slot the drain just freed;
            # join the (now stop-aware) producer and drain again so no
            # device-placed batch outlives the abandonment
            t.join(timeout=2.0)
            drain()


def synthetic_records(n: int, rng: Optional[random.Random] = None,
                      n_labels: int = 5, words: Optional[List[str]] = None
                      ) -> List[dict]:
    """Synthetic JSONL-shaped records for tests/benchmarks."""
    rng = rng or random.Random(0)
    words = words or [f"word{i}" for i in range(50)]
    recs = []
    for i in range(n):
        text = " ".join(rng.choices(words, k=rng.randint(5, 30)))
        recs.append(dict(id=str(i), split="train",
                         label=f"label{rng.randrange(n_labels)}",
                         text=text, img=f"img{i}.jpg"))
    return recs
