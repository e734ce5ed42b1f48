"""Online translation service with dynamic batching.

The reference stack (SURVEY.md §3.3) is batch-file-in / batch-file-out; a
production deployment needs an *online* path: individual requests arriving
at arbitrary times, coalesced into full device batches so the TPU always
sees the static (batch, bucket) shapes it compiled for.

TPU-native shape of the problem:

- XLA programs are compiled per shape, so the batcher NEVER varies the
  batch dimension: every group is padded to ``DecodeConfig.batch_size``
  rows with ``example_mask`` semantics (data/dataset.py:206 does the
  padding; one compile per source bucket, all warmed at startup).
- Dynamic batching happens on the host: a single worker thread drains a
  queue, waiting at most ``max_wait_ms`` after the first request to let a
  batch fill (the classic latency/throughput knob), then runs the whole
  group through one device call.
- The device never idles on tokenization: tokenize/BPE run on the caller's
  thread at submit time, the worker only pads + dispatches.

The service wraps :class:`~variational_mmt_tpu.decode.translator.Translator`
— results are bit-identical to offline ``translate`` CLI output for the
same DecodeConfig.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from variational_mmt_tpu.config import DecodeConfig
from variational_mmt_tpu.serve.errors import ClientError
from variational_mmt_tpu.data.bpe import BPE
from variational_mmt_tpu.data.tokenizer import tokenize
from variational_mmt_tpu.data.vocab import Vocab
from variational_mmt_tpu.decode.translator import Translator
from variational_mmt_tpu.models.model import VMMTModel


@dataclass
class ServeConfig:
    """Online-serving knobs (on top of DecodeConfig's search knobs)."""

    max_wait_ms: float = 5.0  # batching window after the first queued request
    warmup: bool = True  # compile every (bucket x batch) shape at startup
    lower: bool = True  # lowercase incoming text (reference preprocessing)
    queue_capacity: int = 4096  # back-pressure: submit blocks when full
    conv_regions: int = 49  # rows per conv feature map (ResNet 7x7 grid)
    # longest accepted source, in post-BPE tokens (0 = the largest bucket;
    # a larger value adds a warmed bucket of that length). Anything longer
    # is rejected (or truncated with over_length="truncate") at submit time:
    # the offline CLI's catch-all bucket would mean an in-line multi-second
    # XLA compile PER DISTINCT over-length, stalling every queued request —
    # warmup must stay exhaustive for the shapes live traffic can produce
    max_src_tokens: int = 0
    over_length: str = "reject"  # "reject" -> client error | "truncate"
    # 2 = two-deep pipelined worker (gather/dispatch group N+1 while N
    # computes on the device; host postprocessing overlaps device work);
    # 1 = classic collect -> dispatch -> finalize, one group at a time.
    # 0 = AUTO (the default): resolve from the host core count at service
    # construction — measured on the round-4 one-window table
    # (docs/perf_notes.md "Consolidated serving table"): depth 2 wins +18%
    # on a 4-core host but LOSES 17% with 2.7x the p99 on a 1-core host,
    # where the extra in-flight group only adds queueing because no second
    # core exists to run the overlap. Rule: depth 1 on single-core hosts,
    # depth 2 otherwise. Explicit 1/2 still forces either mode (the A/B
    # baseline knob); results are identical either way (tested).
    pipeline_depth: int = 0

    def resolved_pipeline_depth(self) -> int:
        if self.pipeline_depth in (1, 2):
            return self.pipeline_depth
        return 1 if (os.cpu_count() or 1) <= 1 else 2


@dataclass
class _Request:
    ids: List[int]  # vocab-encoded source (encoding runs on the CALLER's thread)
    img: Optional[np.ndarray]
    # maps the raw n-best [(score, out_ids[, attn])] to the caller's payload
    # (text requests decode/detok here); None -> the future resolves to the
    # raw id-level n-best, which is what the MP dispatchers want on the wire
    postproc: Optional[callable] = None
    # absolute time.monotonic() past which the caller has stopped waiting
    # (its stated result timeout); the worker SHEDS expired requests at
    # dispatch time — device work on them could never be answered in time
    deadline: Optional[float] = None
    # per-request PRNG stream key (sampling services): the sampled answer is
    # a pure function of (server seed, sample_id, source, image) — invariant
    # to how the dynamic batcher grouped the request with other traffic
    sample_id: int = 0
    future: Future = field(default_factory=Future)


class TranslationService:
    """Queue + worker-thread dynamic batcher over a :class:`Translator`.

    Thread-safe: any number of producer threads may call :meth:`submit` /
    :meth:`translate_text`; one worker owns the device.
    """

    def __init__(
        self,
        model: VMMTModel,
        params,
        src_vocab: Vocab,
        tgt_vocab: Vocab,
        dcfg: Optional[DecodeConfig] = None,
        buckets: Sequence[int] = (16, 24, 32, 48, 64),
        scfg: Optional[ServeConfig] = None,
        bpe: Optional[BPE] = None,
        mesh=None,
    ):
        self.dcfg = dcfg or DecodeConfig()
        self.scfg = scfg or ServeConfig()
        # resolve AUTO (0) once, at construction, so the worker loop and
        # stats report one stable mode for the service's lifetime
        self.pipeline_depth = self.scfg.resolved_pipeline_depth()
        self.bpe = bpe
        # checkpoint ensemble: model may be a list (params a matching list of
        # trees); the Translator combines per-step distributions on-device.
        # The caller (cli/serve.py) enforces vocab/feature-interface match.
        self.models = list(model) if isinstance(model, (list, tuple)) else [model]
        self.model = self.models[0]
        # the interface member must be a decode-time feature consumer when
        # one exists (the shared rule in cli/loading.py, which the ensemble
        # guard enforces agreement over); a vmmt_f trained on wider features
        # may legally share an ensemble with a narrower vmmt_c — its v is
        # ignored at decode
        from variational_mmt_tpu.config import consumes_decode_feats

        img_members = [
            m for m in self.models if consumes_decode_feats(m.cfg)
        ] or [
            m for m in self.models
            if (m.is_latent or m.cfg.use_img_predict) and m.cfg.img_feat_dim > 0
        ]
        self._img_cfg = img_members[0].cfg if img_members else None
        self._img_dim = self._img_cfg.img_feat_dim if self._img_cfg else 0
        if self.scfg.over_length not in ("reject", "truncate"):
            raise ValueError(
                f"over_length must be 'reject' or 'truncate', got "
                f"{self.scfg.over_length!r}")
        if self.scfg.max_src_tokens < 0:
            raise ValueError(
                f"max_src_tokens must be >= 0, got {self.scfg.max_src_tokens}")
        self._src_cap = self.scfg.max_src_tokens or max(buckets)
        if self._src_cap > max(buckets):
            buckets = list(buckets) + [self._src_cap]  # warmed like the rest
        self.translator = Translator(
            model, params, src_vocab, tgt_vocab, self.dcfg, buckets=buckets,
            mesh=mesh,
        )
        self._samples = (self.dcfg.sampling_temp > 0.0
                         or self.dcfg.latent_from == "sample")
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue(
            maxsize=self.scfg.queue_capacity
        )
        self.stats: Dict[str, float] = {
            "requests": 0,
            "batches": 0,
            "batched_requests": 0,  # requests that shared a device call
            "shed": 0,  # expired before dispatch (caller's timeout passed)
            "busy_s": 0.0,
        }
        self._stats_lock = threading.Lock()
        self._stopped = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True, name="vmmt-serve")
        self._worker.start()
        if self.scfg.warmup:
            self.warmup()

    # ------------------------------------------------------------------
    # producer API
    # ------------------------------------------------------------------
    def _validated(
        self, tokens: List[str], img: Optional[np.ndarray]
    ) -> Tuple[List[str], Optional[np.ndarray]]:
        """Apply the over-length policy and image defaults/shape check;
        raises ClientError without side effects so multi-sentence callers
        can validate a whole request before enqueuing any of it."""
        if not tokens:
            # an all-PAD source row has fully-masked attention (uniform
            # softmax over NEG_INF scores) and decodes to confident garbage
            raise ClientError(
                "empty source: the text contains no tokens after "
                "tokenization")
        if len(tokens) > self._src_cap:
            if self.scfg.over_length == "truncate":
                tokens = tokens[: self._src_cap]
            else:
                raise ClientError(
                    f"source has {len(tokens)} tokens but this server caps at "
                    f"{self._src_cap} (every accepted length is compiled at "
                    "warmup; raise ServeConfig.max_src_tokens or set "
                    "over_length='truncate')")
        if self._img_dim and img is None:
            # latent models condition the prior on v; an online request
            # without an image degrades to the zero-feature vector
            img = np.zeros(self._feat_shape(), np.float32)
        if img is not None:
            img = np.asarray(img, np.float32)
            want = self._feat_shape()
            if want and img.shape != want:
                raise ClientError(
                    f"img features must have shape {want}, got {img.shape}")
        return tokens, img

    def _checked_sample_id(self, sample_id: int) -> int:
        """sample_id selects the per-request PRNG stream on a SAMPLING
        service (dcfg.sampling_temp > 0 or latent_from='sample'); on a
        deterministic service a nonzero value would be silently meaningless,
        which is a client mistake worth surfacing."""
        sample_id = int(sample_id)
        if sample_id != 0 and not self._samples:
            raise ClientError(
                "sample_id is only meaningful on a sampling service "
                "(DecodeConfig.sampling_temp > 0 or latent_from='sample'); "
                "this server decodes deterministically")
        if sample_id < 0:
            raise ClientError(f"sample_id must be >= 0, got {sample_id}")
        return sample_id

    def _enqueue(
        self, ids: List[int], img: Optional[np.ndarray], postproc=None,
        timeout_s: Optional[float] = None, sample_id: int = 0,
    ) -> Future:
        deadline = time.monotonic() + timeout_s if timeout_s is not None else None
        req = _Request(ids=ids, img=img, postproc=postproc, deadline=deadline,
                       sample_id=sample_id)
        self._q.put(req)
        with self._stats_lock:
            self.stats["requests"] += 1
        return req.future

    def _text_postproc(self, src_tokens: List[str]):
        """Postprocessing closure for a text-mode request: vocab decode +
        replace_unk + BPE removal, exactly Translator.translate_tokens'
        per-sentence path (bit-identical to the offline CLI)."""
        def pp(nbest):
            return self.translator.nbest_to_text(nbest, src_tokens)
        return pp

    def submit_tokens(
        self, tokens: List[str], img: Optional[np.ndarray] = None,
        timeout_s: Optional[float] = None, sample_id: int = 0,
    ) -> Future:
        """Enqueue one pre-tokenized sentence; resolves to the n-best list
        [(score, text), ...] (same payload as Translator.translate_tokens).
        Vocab encoding runs here, on the caller's thread — the worker thread
        owns the device and must spend its time dispatching, not on dict
        lookups. ``timeout_s``: how long the caller will wait for the
        result; a request still queued past that is shed, not computed.
        ``sample_id`` (sampling services only): PRNG stream key — the answer
        is reproducible for a given (server seed, sample_id, source, image)
        no matter how the batcher groups it; different ids give alternative
        translations of the same source."""
        if self._stopped.is_set():
            raise RuntimeError("service stopped")
        sample_id = self._checked_sample_id(sample_id)
        tokens, img = self._validated(tokens, img)
        return self._enqueue(self.translator.src_vocab.encode(tokens), img,
                             self._text_postproc(tokens), timeout_s=timeout_s,
                             sample_id=sample_id)

    def submit_tokens_batch(
        self, tokens_list: Sequence[List[str]], imgs: Optional[np.ndarray] = None,
        timeout_s: Optional[float] = None,
        sample_ids: Optional[Sequence[int]] = None,
    ) -> List[Future]:
        """Validate EVERY sentence of a multi-sentence request, then enqueue
        all of them. A rejection (e.g. one over-length source) therefore
        costs no device work: nothing from the request reaches the queue."""
        if self._stopped.is_set():
            raise RuntimeError("service stopped")
        sids = self._checked_sample_ids(sample_ids, len(tokens_list))
        pairs = [
            self._validated(toks, None if imgs is None else imgs[i])
            for i, toks in enumerate(tokens_list)
        ]
        return [
            self._enqueue(self.translator.src_vocab.encode(toks), img,
                          self._text_postproc(toks), timeout_s=timeout_s,
                          sample_id=sid)
            for (toks, img), sid in zip(pairs, sids)
        ]

    def _checked_sample_ids(self, sample_ids, n: int) -> List[int]:
        if sample_ids is None:
            return [0] * n
        if len(sample_ids) != n:
            raise ClientError(
                f"sample_ids must have one entry per sentence: got "
                f"{len(sample_ids)} for {n}")
        return [self._checked_sample_id(s) for s in sample_ids]

    def submit_ids_batch(
        self, ids_list: Sequence[List[int]], imgs: Optional[np.ndarray] = None,
        timeout_s: Optional[float] = None,
        sample_ids: Optional[Sequence[int]] = None,
    ) -> List[Future]:
        """Id-level twin of :meth:`submit_tokens_batch`: sources arrive
        already vocab-encoded and futures resolve to the RAW n-best
        [(score, out_ids), ...] — no text materializes in this process.
        This is the MP dispatchers' path (serve/rpc.py): tokenize/BPE/vocab
        work happens in their interpreters, so the device-owning process
        spends its GIL only on padding and dispatch."""
        if self._stopped.is_set():
            raise RuntimeError("service stopped")
        sids = self._checked_sample_ids(sample_ids, len(ids_list))
        pairs = [
            self._validated(list(ids), None if imgs is None else imgs[i])
            for i, ids in enumerate(ids_list)
        ]
        return [self._enqueue(ids, img, timeout_s=timeout_s, sample_id=sid)
                for (ids, img), sid in zip(pairs, sids)]

    def _text_to_tokens(self, text: str) -> List[str]:
        toks = tokenize(text, lower=self.scfg.lower)
        if self.bpe is not None:
            toks = self.bpe.segment(toks)
        return toks

    def submit_text(self, text: str, img: Optional[np.ndarray] = None,
                    timeout_s: Optional[float] = None,
                    sample_id: int = 0) -> Future:
        return self.submit_tokens(self._text_to_tokens(text), img,
                                  timeout_s=timeout_s, sample_id=sample_id)

    def translate_text(
        self, texts: Sequence[str], imgs: Optional[np.ndarray] = None,
        timeout: float = 120.0, sample_ids: Optional[Sequence[int]] = None,
    ) -> List[List]:
        """Synchronous convenience: submit all, wait for all (all-or-nothing
        at submit time — see submit_tokens_batch). ``timeout`` doubles as
        the shed deadline: a sentence still queued after it is failed, not
        computed (the caller below has already raised by then)."""
        futs = self.submit_tokens_batch(
            [self._text_to_tokens(t) for t in texts], imgs, timeout_s=timeout,
            sample_ids=sample_ids)
        return [f.result(timeout=timeout) for f in futs]

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    def warmup(self) -> None:
        """Compile every bucket's decode program before serving traffic (one
        sentence per bucket length; the batcher pads each group to the full
        static batch, so one shape per bucket covers everything)."""
        unk = self.translator.src_vocab.encode(["warmup"])[0]
        for b in self.translator.buckets:
            # exactly length b: b-1 would be assigned to an adjacent smaller
            # bucket (e.g. buckets 32,33), leaving this one uncompiled
            ids = [[unk] * max(1, b)]
            feats = (
                np.zeros((1,) + self._feat_shape(), np.float32) if self._img_dim else None
            )
            self.translator.translate_ids(ids, feats)

    def stop(self, timeout: float = 10.0) -> None:
        self._stopped.set()
        self._q.put(None)
        self._worker.join(timeout=timeout)
        # a submit racing past the stopped-check may have enqueued BEHIND
        # the sentinel; fail those futures instead of hanging their callers
        while True:
            try:
                req = self._q.get_nowait()
            except queue.Empty:
                break
            if req is not None and not req.future.done():
                try:
                    req.future.set_exception(RuntimeError("service stopped"))
                except Exception:  # noqa: BLE001
                    pass

    # ------------------------------------------------------------------
    # worker
    # ------------------------------------------------------------------
    def _feat_shape(self):
        if not self._img_dim:
            return ()
        if self._img_cfg.img_feat_type == "conv":
            return (self.scfg.conv_regions, self._img_dim)
        return (self._img_dim,)

    def _collect(self, group: Optional[List[_Request]] = None) -> List[_Request]:
        """Gather one dynamic batch when the device is idle: block for the
        first request (unless ``group`` already holds a partial batch to
        top up), then drain up to batch_size within the max_wait_ms window.
        Sets ``_stop_seen`` when the stop sentinel surfaces."""
        group = list(group or ())
        if not group:
            first = self._q.get()
            if first is None:
                self._stop_seen = True
                return []
            group = [first]
        deadline = time.monotonic() + self.scfg.max_wait_ms / 1000.0
        while len(group) < self.dcfg.batch_size:
            remain = deadline - time.monotonic()
            try:
                nxt = self._q.get(timeout=max(0.0, remain)) if remain > 0 else self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is None:  # stop sentinel: flag for the outer loop
                # (re-posting with a blocking put() could deadlock the sole
                # consumer against a full queue of producers)
                self._stop_seen = True
                break
            group.append(nxt)
        return group

    def _collect_fill(self, in_flight_ready) -> List[_Request]:
        """Gather the NEXT batch while the previous one is still computing
        on the device: drain the queue until the batch is FULL (dispatch it
        early — that is the pipeline win) or ``in_flight_ready()`` turns
        true (return whatever has gathered — possibly nothing — for the
        caller to decide). A partial group is NOT dispatched from here:
        under closed-loop traffic most clients are blocked on the in-flight
        group, so dispatching at device-idle ships under-filled batches the
        device pads to full batch_size anyway (measured on TPU: 138 sent/s
        at fill 17.5 vs 343 at fill 32) — the caller finalizes the
        in-flight group first and tops the partial batch up within the
        classic max_wait_ms window instead."""
        group: List[_Request] = []
        while len(group) < self.dcfg.batch_size:
            try:
                nxt = self._q.get_nowait()
            except queue.Empty:
                if not group:
                    # empty queue, nothing gathered: no pressure — return
                    # now so the caller does a BLOCKING finalize instead of
                    # sitting here polling ready() (each probe is a runtime
                    # RPC; at 1 ms cadence it measurably starved the
                    # remote-device stream: 303 vs 382 sent/s on TPU)
                    break
                if in_flight_ready():
                    break
                try:  # nap briefly, bounded so readiness is re-checked
                    nxt = self._q.get(timeout=0.002)
                except queue.Empty:
                    continue
            if nxt is None:
                self._stop_seen = True
                break
            group.append(nxt)
        return group

    def _shed_expired(self, group: List[_Request]) -> List[_Request]:
        """Drop requests whose caller-stated result timeout has already
        passed while they sat in the queue: their futures fail with
        TimeoutError (what the caller has already raised on its own side),
        and the device never computes answers nobody is waiting for. Load
        shedding under overload: the queue drains at dispatch speed instead
        of dragging every later request past ITS deadline too."""
        now = time.monotonic()
        live: List[_Request] = []
        dead: List[_Request] = []
        for r in group:
            (dead if r.deadline is not None and r.deadline < now else live).append(r)
        if dead:
            self._fail_group(dead, TimeoutError(
                "request deadline expired before dispatch (shed under load)"))
            with self._stats_lock:
                self.stats["shed"] += len(dead)
        return live

    def _fail_group(self, group: List[_Request], e: Exception) -> None:
        for r in group:
            if not r.future.done():
                try:
                    r.future.set_exception(e)
                except Exception:  # noqa: BLE001 — cancelled race
                    pass

    def _finish(self, group: List[_Request], pending, dispatched_at: float) -> None:
        """Block on a dispatched group's device work, postprocess, resolve
        futures, and account stats. ``busy_s`` accrues the de-overlapped
        union of [dispatch, drain-complete] windows (``_busy_mark`` is the
        previous window's end), so it approximates DEVICE busy time whether
        or not the pipeline overlapped this group with host work — the old
        per-call wall bracketing read near-zero for windows the worker
        spent in _collect_fill while the device was 100% busy."""
        try:
            out = self.translator.finalize_ids(pending)
            drained = time.monotonic()
            for r, nbest in zip(group, out):
                if r.future.done():
                    # a client may have cancel()ed while queued; its
                    # InvalidStateError must not poison the REST of the batch
                    continue
                try:
                    payload = r.postproc(nbest) if r.postproc is not None else nbest
                except Exception as e:  # noqa: BLE001 — per-request postproc bug
                    try:
                        r.future.set_exception(e)
                    except Exception:  # noqa: BLE001
                        pass
                    continue
                try:
                    r.future.set_result(payload)
                except Exception:  # noqa: BLE001 — cancelled race
                    pass
        except Exception as e:  # device/transfer error: the whole group
            self._fail_group(group, e)
            drained = time.monotonic()
        busy = drained - max(dispatched_at, self._busy_mark)
        self._busy_mark = max(self._busy_mark, drained)
        self._account_batch(group, busy)

    def _account_batch(self, group: List[_Request], busy: float) -> None:
        with self._stats_lock:
            self.stats["batches"] += 1
            if len(group) > 1:
                self.stats["batched_requests"] += len(group)
            self.stats["busy_s"] += max(0.0, busy)

    def _run(self) -> None:
        """Two-deep pipelined worker. While group N computes on the device,
        the worker gathers group N+1 from the queue (``_collect_fill``) and
        dispatches it early ONLY if it fills completely during N's flight —
        JAX's async dispatch makes Translator.dispatch_ids return
        immediately, so N's host-side postprocessing (vocab decode, detok,
        future resolution) then overlaps N+1's device compute. The full-
        batch gate matters: under closed-loop traffic the clients that
        would fill N+1 are mostly blocked on N, so the worker instead
        finalizes N first (unblocking them) and tops the partial batch up
        within the classic max_wait_ms window. The pipeline therefore
        engages exactly when there is genuine queue pressure (arrivals
        beyond one batch per compute window) and degrades to the serial
        loop otherwise; with an idle queue the in-flight group finalizes
        the moment the device is done (no added latency)."""
        self._stop_seen = False
        self._busy_mark = time.monotonic()
        prev: Optional[Tuple[List[_Request], object, float]] = None
        while True:
            if self._stop_seen:
                group = []
            elif prev is None:
                group = self._collect()
            else:
                group = self._collect_fill(prev[1].ready)
                if (group and len(group) < self.dcfg.batch_size
                        and not self._stop_seen):
                    # device idle, partial gather: no queue pressure —
                    # resolve the in-flight group so its callers can
                    # resubmit, then top up within the normal window
                    self._finish(*prev)
                    prev = None
                    group = self._collect(group)
            nxt = None
            if group:
                group = self._shed_expired(group)
            if group:
                t0 = time.monotonic()
                try:
                    imgs = None
                    if self._img_dim:
                        imgs = np.stack(
                            [r.img for r in group]
                        )  # submit guaranteed presence+shape
                    # per-request PRNG streams: sampled answers must not
                    # depend on group composition, so the stream key is the
                    # request's sample_id, not its position in this batch
                    sids = ([r.sample_id for r in group]
                            if self._samples else None)
                    nxt = (group,
                           self.translator.dispatch_ids(
                               [r.ids for r in group], imgs, stream_ids=sids),
                           t0)
                except Exception as e:  # bad dispatch: fail just this group
                    self._fail_group(group, e)
                    # still a consumed gather: count it so mean_batch_fill
                    # (requests/batches) stays honest on error paths
                    self._account_batch(group, time.monotonic() - t0)
            if self.pipeline_depth <= 1 and nxt is not None:
                # A/B baseline: finalize immediately, never carry in-flight
                # work across iterations (classic one-group-at-a-time loop)
                self._finish(*nxt)
                nxt = None
            if prev is not None:
                self._finish(*prev)
            prev = nxt
            if prev is None and self._stop_seen:
                return
