"""Generation orchestration: the TPU-native ``Generator``.

Capability parity with the reference Generator (reference
sesameai/generator.py:41-300): voice-context Segment prompts, AR frame
loop at 12.5 Hz, all-zero-frame EOS, streaming chunked decode with an
``on_chunk_generated`` callback, the 2048-position input guard, and
``generate(stream=...)``.

TPU-native differences (the point of the rebuild, SURVEY.md §7):

* The AR loop is **chunked scans on device** (models/csm.py
  ``decode_frames``): sampling, feedback embedding and EOS accounting
  never round-trip to the host (the reference syncs every frame,
  generator.py:180-203). The host sees one (frames, valid, done) bundle
  per chunk.
* Audio emission is **frame-granular**: Mimi streaming decode carries
  conv/transformer state (codec/mimi.py), so first audio needs one
  frame, not the reference's fixed 10-frame buffer (generator.py:61).
* Prompt lengths are bucketed (pad right + ``valid_len``) so prefill
  compiles once per bucket, not per prompt length.
* KV caches are donated buffers — decode updates in place in HBM.
"""

from __future__ import annotations

import functools
import math
import threading
import time
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sesameai_tts_tpu.core.config import CSMConfig, GenerationConfig
from sesameai_tts_tpu.codec.mimi import Mimi
from sesameai_tts_tpu.models import csm as csm_model
from sesameai_tts_tpu.models.transformer import precompute_rope
from sesameai_tts_tpu.runtime.frames import (
    FrameTokenizer,
    Segment,
    pad_audio_to_frame_bucket,
)
from sesameai_tts_tpu.utils.profiling import Metrics

import logging

log = logging.getLogger(__name__)

MAX_SEQ_LEN = 2048  # backbone positions (reference generator.py:169)
FRAME_MS = 80.0  # 12.5 Hz (reference generator.py:151)


def _next_bucket(n: int, buckets: Sequence[int], room: Optional[int] = None) -> int:
    """Smallest bucket ≥ n; capped to ``room`` (slots left in the KV cache)
    so a padded prefill can never write past the cache end —
    ``dynamic_update_slice`` CLAMPS out-of-range starts, which would
    silently shift the write window onto earlier (real) slots.

    When the bucket would spill past ``room`` (a long cached context
    eating most of the cache), fall back to the largest 64-multiple that
    still fits: clamping to the EXACT room would mint a fresh padded
    shape — and a minutes-long remote compile — per context length."""
    for b in buckets:
        if n <= b:
            if room is None or b <= room:
                return b
            q = (room // 64) * 64
            return q if q >= n else room
    raise ValueError(f"Inputs too long, must be below max_seq_len: {n} > {buckets[-1]}")


class Generator:
    """Owns CSM params + Mimi + tokenizer; exposes generate/generate_stream.

    Public surface mirrors reference generator.py:41-300; internals are
    jitted JAX programs cached per shape bucket.
    """

    def __init__(
        self,
        csm_params: dict,
        csm_cfg: CSMConfig,
        mimi: Mimi,
        mimi_params: dict,
        text_tokenizer,
        stream_chunk_frames: int = 1,
        decode_chunk_frames: int = 10,
        offline_chunk_frames: Optional[int] = None,
        seed: int = 0,
        unroll: bool = True,
        mesh=None,
        codec_device=None,
    ):
        # decode path default: unrolled layer/codebook loops over per-layer
        # weight buffers (see models/csm.py::unstack_csm_params) — measured
        # prerequisite for int8 bandwidth + decoder-weight on-chip reuse
        self._unrolled = unroll
        if unroll:
            csm_params = csm_model.unstack_csm_params(csm_params)
        # multi-chip inference: params TP-sharded over the mesh, codec
        # replicated, states dp-sharded (parallel/infer.py); single-chip
        # (mesh=None) paths are untouched
        self._mesh = mesh
        if mesh is not None:
            from sesameai_tts_tpu.parallel.infer import (
                shard_csm_params,
                shard_replicated,
            )

            csm_params = shard_csm_params(csm_params, mesh)
            mimi_params = shard_replicated(mimi_params, mesh)
        # two-stage pipeline parallelism (SURVEY §2.3 PP row): pin the
        # codec to its own chip — Mimi decode of chunk k overlaps the AR
        # decode of chunk k+1 across devices (single-chip mode instead
        # fuses both into one program; see _decode_mimi_packed)
        self._codec_device = codec_device
        if codec_device is not None:
            assert mesh is None, "codec_device and mesh are mutually exclusive"
            mimi_params = jax.device_put(mimi_params, codec_device)
        self._params = csm_params
        # quantized trunks: keep a persistent bf16 shadow for PREFILL —
        # long prefills are compute-bound and otherwise hit a dense-dequant
        # fallback that re-materializes every weight per call.  Decode
        # programs keep streaming the int8/int4 weights (bandwidth-bound).
        from sesameai_tts_tpu.ops.quant import dequantize_csm

        def _any_quant(tree):
            return any(
                isinstance(x, dict) and ("q" in x or "q4" in x)
                for x in jax.tree.leaves(
                    tree, is_leaf=lambda x: isinstance(x, dict) and (
                        "q" in x or "q4" in x
                    )
                )
            )

        if mesh is None and _any_quant(csm_params):
            self._prefill_params = jax.jit(dequantize_csm)(csm_params)
        else:
            self._prefill_params = csm_params
        self._cfg = csm_cfg
        self._mimi = mimi
        self._mimi_params = mimi_params
        # codec states must match the codec param dtype (bf16 flagship:
        # convs at full MXU rate; PCM leaves every program as f32)
        self._mimi_dtype = jax.tree.leaves(mimi_params)[0].dtype
        self.sample_rate = mimi.cfg.sample_rate
        self._hop = mimi.cfg.hop_length
        self._stream_chunk_frames = stream_chunk_frames
        self._decode_chunk_frames = decode_chunk_frames
        # offline generate() ramps from a bigger base than streaming:
        # nobody consumes partial audio mid-utterance, so the only cost
        # of a larger first chunk is EOS-overshoot — and the descend-fit
        # tail bounds overshoot to < base frames either way.
        # The best base depends on the host↔device link, which on
        # remote-attached TPUs varies by the hour (measured same programs:
        # ~30 ms RTT → 25-ramp wins, 0.0965 vs 0.0981 RTF; ~60 ms RTT →
        # the one-dispatch 125 base wins, 0.107 vs 0.119) — so the default
        # is chosen from a measured dispatch+fetch probe at build time.
        if offline_chunk_frames is not None:
            self._offline_chunk_frames = offline_chunk_frames
        else:
            fallback = max(25, decode_chunk_frames)
            rtt = self._probe_rtt(fallback)
            self._offline_chunk_frames = fallback if rtt < 0.045 else 125
            log.info(
                "link RTT %.1f ms → offline decode base %d frames",
                rtt * 1e3, self._offline_chunk_frames,
            )
        self._key = jax.random.PRNGKey(seed)
        self._key_lock = threading.Lock()
        self._rope = precompute_rope(csm_cfg.backbone)
        self._max_seq_len = csm_cfg.backbone.max_seq_len
        self.metrics = Metrics()  # per-stage timings (utils/profiling.py)

        self._tokenizer = FrameTokenizer(
            text_tokenizer, self._encode_audio, csm_cfg.audio_num_codebooks
        )

        self._prefill_buckets = [64, 128, 256, 384, 512, 768, 1024, 1536, 2048]
        self._build_programs()

    # -- jitted programs ----------------------------------------------------

    def _build_programs(self):
        cfg, mimi = self._cfg, self._mimi

        # temperature/topk are traced (possibly per-slot arrays): no
        # recompile when a request changes sampling params
        @jax.jit
        def prefill(params, state, tokens, mask, valid_len, key, temperature, topk):
            return csm_model.generate_frame(
                params, cfg, state, tokens, mask, key,
                temperature, topk, valid_len=valid_len, rope_cs=self._rope,
            )

        @functools.partial(
            jax.jit, static_argnames=("num_frames",), donate_argnames=("state",)
        )
        def decode(params, state, prev_frame, done, key, num_frames, temperature,
                   topk, start=0):
            return csm_model.decode_frames(
                params, cfg, state, prev_frame, done, key, num_frames,
                temperature, topk, rope_cs=self._rope, start_index=start,
            )

        @functools.partial(
            jax.jit, static_argnames=("num_frames",), donate_argnames=("state",)
        )
        def decode_packed(params, state, prev_frame, done, key, num_frames,
                          temperature, topk, start=0):
            """decode + results packed into ONE int32 buffer: on
            remote-attached TPUs every host fetch is a network round trip,
            so (frames, valid, done) travel together."""
            frames, valid, done, state = csm_model.decode_frames(
                params, cfg, state, prev_frame, done, key, num_frames,
                temperature, topk, rope_cs=self._rope, start_index=start,
            )
            packed = jnp.concatenate([
                frames.reshape(-1),
                valid.astype(jnp.int32).reshape(-1),
                done.astype(jnp.int32).reshape(-1),
            ])
            return packed, frames[-1], done, state

        @functools.partial(
            jax.jit,
            static_argnames=("num_frames",),
            donate_argnames=("state", "mimi_state"),
        )
        def decode_mimi_packed(params, mimi_params, state, mimi_state, prev_frame,
                               done, key, num_frames, temperature, topk, start=0):
            """One fused chunk: AR decode + streaming Mimi + everything
            the host needs in ONE int32 buffer (frames, valid, done, PCM
            bitcast).  On this remote-attached TPU each fetch is a ~30 ms
            round trip; streaming/serving previously paid 2-5 per chunk
            (frames, then per-slot PCM) — this pays exactly one."""
            frames, valid, done2, state = csm_model.decode_frames(
                params, cfg, state, prev_frame, done, key, num_frames,
                temperature, topk, rope_cs=self._rope, start_index=start,
            )
            codes = frames.transpose(1, 2, 0)  # (B, K, n)
            wav, mimi_state = mimi.decode_streaming(mimi_params, codes, mimi_state)
            # post-EOS frames are zeros: the codec state consumes them but
            # their PCM is causal-downstream of the emitted prefix, which
            # the host trims by the valid count (streaming == offline holds
            # for everything emitted)
            packed = jnp.concatenate([
                frames.reshape(-1),
                valid.astype(jnp.int32).reshape(-1),
                done2.astype(jnp.int32).reshape(-1),
                jax.lax.bitcast_convert_type(
                    wav.astype(jnp.float32).reshape(-1), jnp.int32
                ),
            ])
            return packed, frames[-1], done2, state, mimi_state

        @functools.partial(jax.jit, donate_argnames=("mimi_state",))
        def first_chunk(mimi_params, frame, done, mimi_state):
            """First-audio path: decode the prefill frame through Mimi and
            bundle (done, PCM) into one fetch — TTFA pays one round trip
            after prefill, not three."""
            wav, mimi_state = mimi.decode_streaming(
                mimi_params, frame[:, :, None], mimi_state
            )
            packed = jnp.concatenate([
                done.astype(jnp.int32).reshape(-1),
                frame.reshape(-1),  # serving admission keeps the codes too
                jax.lax.bitcast_convert_type(
                    wav.astype(jnp.float32).reshape(-1), jnp.int32
                ),
            ])
            return packed, mimi_state

        @functools.partial(jax.jit, static_argnames=("ns", "bucket"))
        def finalize_offline(mimi_params, first_frame, packed_chunks, ns, bucket):
            """Offline-generation tail in ONE program: assemble the code
            tensor from the packed chunk buffers, run the full Mimi
            decode, and bundle every chunk's flags plus the PCM into a
            single fetchable buffer (one round trip ends the utterance)."""
            K = cfg.audio_num_codebooks
            parts = [first_frame[:, None, :]]
            for p, n in zip(packed_chunks, ns):
                parts.append(p[: n * K].reshape(n, 1, K).transpose(1, 0, 2))
            codes = jnp.concatenate(parts, axis=1)  # (1, T, K)
            codes = jnp.pad(
                codes, ((0, 0), (0, bucket - codes.shape[1]), (0, 0))
            ).transpose(0, 2, 1)
            wav = mimi.decode(mimi_params, codes)[0, 0].astype(jnp.float32)
            return jnp.concatenate(
                [jnp.ravel(p) for p in packed_chunks]
                + [jax.lax.bitcast_convert_type(wav, jnp.int32)]
            )

        @jax.jit
        def extend(params, state, tokens, mask, valid_len):
            return csm_model.extend_state(
                params, cfg, state, tokens, mask, valid_len, rope_cs=self._rope
            )

        @jax.jit
        def mimi_encode(params, wav):  # (1, 1, T) → (K, F)
            return mimi.encode(params, wav)[0]

        @jax.jit
        def mimi_decode(params, codes):  # (1, K, F) → (T,) f32
            return mimi.decode(params, codes)[0, 0].astype(jnp.float32)

        @functools.partial(jax.jit, donate_argnames=("state",))
        def mimi_decode_stream(params, codes, state):
            wav, state = mimi.decode_streaming(params, codes, state)
            return wav[0, 0].astype(jnp.float32), state

        self._prefill = prefill
        self._extend = extend
        self._decode = decode
        self._decode_packed = decode_packed
        self._decode_mimi_packed = decode_mimi_packed
        self._first_chunk = first_chunk
        self._finalize_offline = finalize_offline
        self._mimi_encode = mimi_encode
        self._mimi_decode = mimi_decode
        self._mimi_decode_stream = mimi_decode_stream

    # -- warmup ---------------------------------------------------------------

    def warmup(
        self,
        serving_batch: Optional[int] = None,
        tick_sizes: Sequence[int] = (),
        stream: bool = True,
        offline: bool = False,
        offline_budget_frames: int = 1125,  # 90 s default generate() budget
        encode_buckets: Sequence[int] = (),
    ) -> dict:
        """Compile every program a live request can first-trigger, BEFORE
        traffic arrives.

        On this remote-attached platform a first-use compile is a
        minutes-long round trip through the compile service; without a
        warmup pass the unlucky first request per (prefill bucket ×
        tick size × first-chunk × finalize) shape pays it live — the
        round-3 bench recorded a 103 s p95 TTFA from exactly this.  The
        reference's warm-up is a single throwaway utterance
        (tts_service.py:118-119), which only touches ONE prefill bucket;
        this pass enumerates the shape set:

        * prefill + extend at every prompt bucket that fits the KV cache
          (fresh and cached-context prefills share these programs — the
          cache key is the padded token shape, not the state contents)
        * the first-audio program (``_first_chunk``)
        * the fused streaming tick at B=1 (``generate_stream`` dispatches
          ONE fixed chunk size — the loop never ramps)
        * with ``serving_batch``/``tick_sizes``: the serving pool's fused
          tick programs at B=slots for each tick size
        * with ``offline``: the ramped offline decode chunk sizes
        * with ``encode_buckets``: the Mimi encode program at those
          power-of-2 frame buckets (the rolling-dialog path — duplex and
          live voice preloads — encodes user/bot audio at whatever
          bucket the clip lands in; ``pad_audio_to_frame_bucket``)

        All inputs are throwaway buffers — donation never touches caller
        state.  Returns {program_name: seconds} (compile-dominated on
        first run; ~ms once the persistent cache is hot).
        """
        K = self._cfg.audio_num_codebooks
        times: dict = {}

        def _timed(name, fn):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            times[name] = time.perf_counter() - t0
            return out

        key = jax.random.PRNGKey(0)
        temp1, topk1 = jnp.float32(0.8), 40
        for b in self._prefill_buckets:
            if b > self._max_seq_len:
                break
            S = min(8, b)
            tok = jnp.zeros((1, b, K + 1), jnp.int32)
            msk = jnp.zeros((1, b, K + 1), bool).at[:, :S, K].set(True)
            vl = jnp.asarray([S], jnp.int32)
            _timed(
                f"prefill_{b}",
                lambda: self._prefill(
                    self._prefill_params, self._init_state(1), tok, msk, vl,
                    key, temp1, topk1,
                ),
            )
            _timed(
                f"extend_{b}",
                lambda: self._extend(
                    self._prefill_params, self._init_state(1), tok, msk, vl
                ),
            )

        frame1 = jnp.zeros((1, K), jnp.int32)
        done1 = jnp.asarray([False])
        _timed(
            "first_chunk",
            lambda: self._first_chunk(
                self._mimi_params, frame1, done1,
                self._mimi.init_decode_state(1, self._mimi_dtype),
            ),
        )

        def _tick(B, n, temperature, topk, start=None):
            # argument TYPES must match the live call sites exactly —
            # scalar vs (B,) sampling params and weak- vs strong-typed
            # start each key a distinct program
            kwargs = {} if start is None else {"start": start}
            return self._decode_mimi_packed(
                self._params, self._mimi_params, self._init_state(B),
                self._mimi.init_decode_state(B, self._mimi_dtype),
                jnp.zeros((B, K), jnp.int32), jnp.zeros((B,), bool),
                key, n, temperature, topk, **kwargs,
            )

        if stream:
            # generate_stream's fused chunk: scalar params, traced start.
            # The streaming loop dispatches ONE fixed size (ramping would
            # mint a fresh program mid-stream), so one compile covers it.
            _timed(
                f"stream_tick_{self._decode_chunk_frames}",
                lambda: _tick(1, self._decode_chunk_frames, temp1, topk1,
                              start=jnp.int32(1)),
            )
        if serving_batch:
            tb = jnp.ones((serving_batch,), jnp.float32)
            kb = jnp.ones((serving_batch,), jnp.int32)
            for n in sorted(set(tick_sizes)):
                _timed(
                    f"serve_tick_b{serving_batch}_n{n}",
                    lambda: _tick(serving_batch, n, tb, kb),
                )
        if offline:
            # offline generate(): ramped decode chunks + the packed
            # lag-1 fetch program (finalize buckets stay shape-dependent
            # on the audio length and are not enumerated here)
            sizes, n, seen = [], self._offline_chunk_frames, 0
            while seen < offline_budget_frames:
                sizes.append(n)
                seen += n
                n = min(n * 2, 200)
            for n in sorted(set(sizes)):
                _timed(
                    f"offline_chunk_{n}",
                    lambda: self._decode_packed(
                        self._params, self._init_state(1),
                        jnp.zeros((1, K), jnp.int32), jnp.zeros((1,), bool),
                        key, n, temp1, topk1, jnp.int32(1),
                    ),
                )
        for b in sorted(set(encode_buckets)):
            # same (1, 1, bucket·hop) shape pad_audio_to_frame_bucket mints
            wav = jnp.zeros((1, 1, b * self._hop), jnp.float32)
            _timed(
                f"mimi_encode_{b}",
                lambda: self._mimi_encode(self._mimi_params, wav),
            )
        total = sum(times.values())
        log.info(
            "warmup: %d programs in %.1fs (slowest: %s)", len(times), total,
            ", ".join(
                f"{k}={v:.1f}s"
                for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:3]
            ),
        )
        return times

    def clone(
        self,
        stream_chunk_frames: Optional[int] = None,
        decode_chunk_frames: Optional[int] = None,
        offline_chunk_frames: Optional[int] = None,
        seed: int = 0,
    ) -> "Generator":
        """A second Generator over the SAME device-resident weights.

        Shares ``_params``, the dequantized prefill shadow, the Mimi
        params and the text tokenizer (nothing is re-initialized,
        re-quantized or re-uploaded — zero extra HBM beyond jit
        executables) while getting FRESH jit wrappers and its own
        schedule knobs.  Two uses:

        * schedule variants (e.g. the bench's one-dispatch
          ``offline_chunk_frames=125`` tuned config) without paying a
          second ~10-minute flagship build;
        * cold-start simulation: a clone's executable caches are empty
          exactly like a restarted server's, so ``clone().warmup()``
          measures persistent-cache repopulation without rebuilding
          weights (VERDICT r4 #1c).

        The clone is as thread-safe as the original (its own PRNG key +
        lock, own Metrics); the shared param trees are read-only in
        every program (only state buffers are donated).
        """
        new = object.__new__(Generator)
        # shared, read-only device state
        new._unrolled = self._unrolled
        new._mesh = self._mesh
        new._codec_device = self._codec_device
        new._params = self._params
        new._prefill_params = self._prefill_params
        new._cfg = self._cfg
        new._mimi = self._mimi
        new._mimi_params = self._mimi_params
        new._mimi_dtype = self._mimi_dtype
        new.sample_rate = self.sample_rate
        new._hop = self._hop
        new._rope = self._rope
        new._max_seq_len = self._max_seq_len
        new._prefill_buckets = list(self._prefill_buckets)
        # per-instance knobs/state
        new._stream_chunk_frames = (
            self._stream_chunk_frames if stream_chunk_frames is None
            else stream_chunk_frames
        )
        new._decode_chunk_frames = (
            self._decode_chunk_frames if decode_chunk_frames is None
            else decode_chunk_frames
        )
        new._offline_chunk_frames = (
            self._offline_chunk_frames if offline_chunk_frames is None
            else offline_chunk_frames
        )
        new._key = jax.random.PRNGKey(seed)
        new._key_lock = threading.Lock()
        new.metrics = Metrics()
        new._tokenizer = FrameTokenizer(
            self._tokenizer.text_tokenizer, new._encode_audio,
            self._cfg.audio_num_codebooks,
        )
        new._build_programs()
        return new

    def _encode_audio(self, audio: np.ndarray) -> np.ndarray:
        """(T,) float32 → (K, F) codes (frames.pad_audio_to_frame_bucket)."""
        wav, frames = pad_audio_to_frame_bucket(audio, self._hop)
        wav_dev = (
            jax.device_put(wav, self._codec_device)
            if self._codec_device is not None
            else jnp.asarray(wav)
        )
        codes = self._mimi_encode(self._mimi_params, wav_dev)
        return np.asarray(codes[:, :frames])

    # -- tokenization (exposed for the service layer's context caching,
    #    the analog of reference tts_service.py:133-138) -------------------

    @property
    def max_seq_len(self) -> int:
        """KV-cache capacity in rows (context + utterance + frames)."""
        return self._max_seq_len

    @property
    def context_budget(self) -> int:
        """Rows a precomputed voice context may occupy: KV capacity minus
        a reserve (an eighth, min 64) for the utterance text + frames.
        The one shared policy for every voice-preload site."""
        return max(16, self._max_seq_len - max(64, self._max_seq_len // 8))

    @property
    def max_clip_samples(self) -> int:
        """Longest context clip (in samples) worth encoding: the largest
        power-of-2 frame bucket (frames.pad_audio_to_frame_bucket) that
        (a) stays inside the codec's RoPE window
        (Mimi.max_latent_positions) and (b) isn't strictly beyond the KV
        context budget — frames past ``context_budget`` rows would be
        tail-trimmed before prefill anyway, so encoding them is pure
        waste.  Longer clips must be trimmed by the caller; nothing
        usable is lost."""
        cfg = self._mimi.cfg
        frames_window = cfg.max_latent_positions // cfg.downsample_stride
        codec_cap = 1 << (frames_window.bit_length() - 1)
        budget_cap = 1 << (self.context_budget - 1).bit_length()  # pow2 ceil
        return min(codec_cap, budget_cap) * self._hop

    @property
    def frame_tokenizer(self) -> FrameTokenizer:
        return self._tokenizer

    def _tokenize_prompt(self, text, speaker, context):
        toks, masks = [], []
        for seg in context:
            if isinstance(seg, Segment):
                t, m = self._tokenizer.segment(seg)
            else:  # pre-tokenized (tokens, mask) pair — cached contexts
                t, m = seg
            toks.append(t)
            masks.append(m)
        t, m = self._tokenizer.text_segment(text, speaker)
        toks.append(t)
        masks.append(m)
        return np.concatenate(toks), np.concatenate(masks)

    def _probe_rtt(self, fallback_base: int = 25) -> float:
        """Median dispatch+fetch round trip of a trivial program (seconds).

        On remote-attached TPUs this is the per-fetch tax every host sync
        pays; CPU/local backends measure ~µs.  Used once at build time to
        pick the offline dispatch schedule."""
        try:
            tiny = jax.jit(lambda x: x + 1)
            x = jnp.zeros((8,), jnp.float32)
            _ = np.asarray(tiny(x))  # compile + first transfer
            times = []
            for _i in range(5):
                t0 = time.perf_counter()
                _ = np.asarray(tiny(x))
                times.append(time.perf_counter() - t0)
            return float(np.median(times))
        except Exception:  # never let a probe failure block construction
            log.warning(
                "link RTT probe failed — assuming a fast link (offline "
                "base %d); pass offline_chunk_frames to override",
                fallback_base, exc_info=True,
            )
            return 0.0

    def _next_key(self):
        # admission workers and the serving tick thread share this PRNG
        with self._key_lock:
            self._key, k = jax.random.split(self._key)
        return k

    def _utterance_keys(self, seed: Optional[int]):
        """(prefill_key, decode_key) for one utterance: drawn from the
        shared stream, or derived from ``seed`` — the same seed always
        reproduces the same audio (stream == offline already holds per
        key, so reproducibility spans both APIs)."""
        if seed is None:
            return self._next_key(), self._next_key()
        kp, ku = jax.random.split(jax.random.PRNGKey(seed))
        return kp, ku

    def _init_state(self, batch_size: int) -> csm_model.CSMState:
        """Fresh backbone state; dp-sharded when running on a mesh."""
        state = csm_model.init_state(
            self._cfg, batch_size, self._params["projection"].dtype,
            unstacked=self._unrolled,
        )
        if self._mesh is not None:
            from sesameai_tts_tpu.parallel.infer import shard_state

            state = shard_state(state, self._mesh)
        return state

    # -- cached voice context ----------------------------------------------

    def precompute_context_state(self, context: Sequence) -> Tuple:
        """Run the backbone over a fixed context ONCE; per-utterance
        prefill then covers only the new text rows.

        TPU upgrade over the reference, which caches tokens but re-runs
        the backbone over the full context every utterance
        (tts_service.py:196-225). Returns an opaque (state, length)
        cached-context handle accepted by the generate APIs."""
        K = self._cfg.audio_num_codebooks
        toks, masks = [], []
        for seg in context:
            t, m = (
                self._tokenizer.segment(seg) if isinstance(seg, Segment) else seg
            )
            toks.append(t)
            masks.append(m)
        tokens = np.concatenate(toks)
        mask = np.concatenate(masks)
        S = tokens.shape[0]
        if S > self._max_seq_len - 16:
            # a context that fills the KV cache leaves no slots for the
            # utterance itself; fail with the remedy instead of the numpy
            # broadcast error the padded copy below would raise
            raise ValueError(
                f"voice context is {S} rows but the KV cache holds "
                f"{self._max_seq_len} (>=16 must stay free for the "
                f"utterance); use shorter reference clips, or "
                f"TTS.load_voice (service/tts.py), which tail-trims to fit"
            )
        bucket = _next_bucket(S, self._prefill_buckets, room=self._max_seq_len)
        tok_pad = np.zeros((1, bucket, K + 1), np.int32)
        msk_pad = np.zeros((1, bucket, K + 1), bool)
        tok_pad[0, :S], msk_pad[0, :S] = tokens, mask

        state = self._init_state(1)
        state = self._extend(
            self._prefill_params, state, jnp.asarray(tok_pad),
            jnp.asarray(msk_pad), jnp.array([S], jnp.int32),
        )
        return (jax.block_until_ready(state), S)

    def _prefill_utterance(
        self, text, speaker, context, cached, max_gen, temperature, topk,
        key=None,
    ):
        """Shared prompt prep + prefill → (frame0, state, done).

        ``key`` overrides the shared PRNG stream (reproducible
        generation via the public ``seed`` kwargs)."""
        K = self._cfg.audio_num_codebooks
        if cached is not None:
            cached_state, ctx_len = cached
            tokens, mask = self._tokenizer.text_segment(text, speaker)
            base_state = cached_state
            total = ctx_len + tokens.shape[0]
        else:
            tokens, mask = self._tokenize_prompt(text, speaker, context)
            base_state = self._init_state(1)
            total = tokens.shape[0]

        # the reference hard-fails whenever prompt + budget exceed 2048
        # (generator.py:169-174); here only a truly over-long prompt raises —
        # an oversized *budget* is clamped to the room left (strictly better:
        # generation still runs, just capped)
        room = self._max_seq_len - total
        if room <= 8:
            raise ValueError(
                "Inputs too long, must be below max_seq_len - max_generation_len: "
                f"{self._max_seq_len - max_gen}"
            )
        max_gen = min(max_gen, room)

        S = tokens.shape[0]
        pos0 = total - S  # 0 uncached; ctx_len with a cached prefix
        bucket = _next_bucket(S, self._prefill_buckets, room=self._max_seq_len - pos0)
        t_prefill = time.perf_counter()
        tok_pad = np.zeros((1, bucket, K + 1), np.int32)
        msk_pad = np.zeros((1, bucket, K + 1), bool)
        tok_pad[0, :S], msk_pad[0, :S] = tokens, mask

        frame, state = self._prefill(
            self._prefill_params, base_state, jnp.asarray(tok_pad),
            jnp.asarray(msk_pad), jnp.array([S], jnp.int32),
            key if key is not None else self._next_key(),
            jnp.float32(temperature), topk,
        )
        done = jnp.all(frame == 0, axis=-1)
        # no sync here: callers overlap their next dispatch (first-chunk
        # Mimi decode / admission scatter) with the prefill execution, so
        # the metric records host prep + dispatch time
        self.metrics.record("prefill_s", time.perf_counter() - t_prefill)
        return frame, state, done, max_gen

    # -- generation ---------------------------------------------------------

    def generate_stream(
        self,
        text: str,
        speaker: int,
        context: Sequence,
        max_audio_length_ms: float = 90_000,
        temperature: float = 0.7,
        topk: int = 30,
        on_chunk_generated: Optional[Callable[[np.ndarray], None]] = None,
        chunk_frames: Optional[int] = None,
        cached_context=None,
        decode_chunk_frames: Optional[int] = None,
        seed: Optional[int] = None,
    ) -> Iterator[np.ndarray]:
        """Yield PCM chunks as frames are generated.

        Parity: reference generate_stream (generator.py:120-210), but
        chunk granularity is configurable down to a single frame (80 ms)
        because Mimi decode streams with carried state.  ``seed`` makes
        the utterance reproducible (same seed → identical audio).
        """
        max_gen = int(max_audio_length_ms / FRAME_MS)
        chunk_frames = chunk_frames or self._stream_chunk_frames
        decode_chunk = decode_chunk_frames or self._decode_chunk_frames
        ring_cap = self._mimi.max_stream_chunk_frames
        if decode_chunk > ring_cap:
            # the fused tick streams Mimi with a carried ring cache whose
            # slack caps the per-chunk frame count; clamping only changes
            # dispatch granularity — sampled audio is schedule-invariant
            # (per-frame keys are fold_in(key, absolute index))
            log.warning(
                "decode_chunk_frames=%d exceeds the codec streaming ring "
                "(%d frames/chunk); clamping", decode_chunk, ring_cap,
            )
            decode_chunk = ring_cap
        key_prefill, utt_key = self._utterance_keys(seed)

        frame, state, done, max_gen = self._prefill_utterance(
            text, speaker, context, cached_context, max_gen, temperature, topk,
            key=key_prefill,
        )

        if self._codec_device is not None:
            yield from self._stream_pipelined(
                frame, state, done, max_gen, temperature, topk,
                chunk_frames, on_chunk_generated, decode_chunk, utt_key,
            )
            return

        mimi_state = self._mimi.init_decode_state(1, self._mimi_dtype)
        hop = self._hop

        def emit(chunk):
            if on_chunk_generated:
                on_chunk_generated(chunk)
            return chunk

        # Everything rides fused device programs (decode + streaming Mimi
        # + packed results): ONE ~30 ms round trip per chunk on this
        # remote-attached TPU, where the old frames-then-PCM cycle paid
        # one per emitted group plus one per chunk.
        # First audio: prefill frame → (done, PCM) in a single fetch.
        packed0, mimi_state = self._first_chunk(
            self._mimi_params, frame, done, mimi_state
        )
        arr0 = np.asarray(packed0)
        if bool(arr0[0]):
            return

        K = self._cfg.audio_num_codebooks
        emitted = 1
        yield emit(arr0[1 + K :].view(np.float32))

        # ONE utterance key; per-frame keys are fold_in(key, frame index)
        # inside decode_frames, so the chunk schedule can't change the
        # sampled audio (stream == offline for the same seed)
        decoded = 1
        done_host = False
        # Lag-1 dispatch: chunk k+1 is dispatched BEFORE chunk k's packed
        # buffer is fetched, so the ~30 ms fetch round trip (remote-attached
        # TPU) rides under chunk k+1's device compute instead of stalling
        # it.  The k+1 decode depends only on device-resident carries
        # (frame/done/state/mimi_state), never on the fetched bytes.  When
        # the fetch reveals EOS, the already-dispatched chunk holds only
        # done-masked invalid frames and is simply never fetched — the same
        # trade the offline _decode_loop makes.  Emission time of chunk k
        # is unchanged (its result is compute-bound either way).
        pending = None  # (packed, n) — dispatched, not yet fetched
        while emitted < max_gen and not done_host:
            new_pending = None
            if decoded < max_gen:
                # fixed chunk size: an arbitrary tail size would compile a
                # fresh program mid-stream (minutes on a remote compile
                # service); overshoot frames are simply not emitted
                n = decode_chunk
                packed, frame, done, state, mimi_state = (
                    self._decode_mimi_packed(
                        self._params, self._mimi_params, state, mimi_state,
                        frame, done, utt_key, n, jnp.float32(temperature),
                        topk, jnp.int32(decoded),
                    )
                )
                decoded += n
                new_pending = (packed, n)
            if pending is not None:
                packed_p, n_p = pending
                arr = np.asarray(packed_p)
                done_host = bool(arr[n_p * K + n_p])
                n_valid = int(arr[n_p * K : n_p * K + n_p].astype(bool).sum())
                n_take = min(n_valid, max_gen - emitted)  # valid = prefix
                wav_np = arr[n_p * K + n_p + 1 :].view(np.float32)
                # emission granularity is host-side slicing of fetched PCM
                for start in range(0, n_take, chunk_frames):
                    g = min(chunk_frames, n_take - start)
                    yield emit(wav_np[start * hop : (start + g) * hop])
                emitted += n_take
            pending = new_pending
            if pending is None:  # budget fully dispatched and drained
                break

    def _stream_pipelined(
        self, frame, state, done, max_gen, temperature, topk,
        chunk_frames, on_chunk_generated, decode_chunk=None, utt_key=None,
    ) -> Iterator[np.ndarray]:
        """Two-chip stage pipeline: AR decode on the model chip, Mimi on
        ``codec_device``.  While the codec chip decodes chunk k's PCM, the
        model chip already runs chunk k+1 — true cross-device overlap
        (the single-chip path instead fuses both stages into one program).
        """
        dev_c = self._codec_device
        K = self._cfg.audio_num_codebooks
        hop = self._hop
        mimi_state = self._mimi.init_decode_state(1, self._mimi_dtype)

        def emit(chunk):
            if on_chunk_generated:
                on_chunk_generated(chunk)
            return chunk

        # first audio: prefill frame → codec chip → (done, frame, PCM)
        packed0, mimi_state = self._first_chunk(
            self._mimi_params,
            jax.device_put(frame, dev_c),
            jax.device_put(done, dev_c),
            mimi_state,
        )
        arr0 = np.asarray(packed0)
        if bool(arr0[0]):
            return
        emitted = 1
        yield emit(arr0[1 + K :].view(np.float32))

        done_host = False
        pending = None  # (wav_dev on codec chip, n_take) — emitted lag-1
        decode_chunk = decode_chunk or self._decode_chunk_frames
        if utt_key is None:
            utt_key = self._next_key()
        decoded = 1
        while emitted < max_gen and not done_host:
            n = decode_chunk
            packed, frame, done, state = self._decode_packed(
                self._params, state, frame, done, utt_key, n,
                jnp.float32(temperature), topk, jnp.int32(decoded),
            )
            decoded += n
            codes_c = jax.device_put(
                packed[: n * K].reshape(n, 1, K).transpose(1, 2, 0), dev_c
            )
            wav_c, mimi_state = self._mimi_decode_stream(
                self._mimi_params, codes_c, mimi_state
            )
            # flags fetch blocks on the model chip only; the codec chip is
            # decoding wav(k) while the next loop iteration dispatches the
            # model chip's chunk k+1
            arr = np.asarray(packed)
            valid_np = arr[n * K : n * K + n].astype(bool)
            done_host = bool(arr[-1])
            n_take = min(int(valid_np.sum()), max_gen - emitted)
            emitted += n_take
            if pending is not None:
                wav_np, take = pending
                wav_np = np.asarray(wav_np)
                for start in range(0, take, chunk_frames):
                    g = min(chunk_frames, take - start)
                    yield emit(wav_np[start * hop : (start + g) * hop])
            pending = (wav_c, n_take)
        if pending is not None:
            wav_np, take = pending
            wav_np = np.asarray(wav_np)
            for start in range(0, take, chunk_frames):
                g = min(chunk_frames, take - start)
                yield emit(wav_np[start * hop : (start + g) * hop])

    def generate(
        self,
        text: str,
        speaker: int,
        context: Sequence,
        max_audio_length_ms: float = 90_000,
        temperature: float = 0.7,
        topk: int = 30,
        stream: bool = False,
        cached_context=None,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """Full-utterance generation (reference generator.py:212-300).

        ``stream=True`` concatenates streamed chunks (reference
        :238-248); otherwise frames are collected on device and decoded
        in one offline Mimi pass (exact — causal decoder).  ``seed``
        makes the utterance reproducible; the same seed yields the same
        audio from ``generate`` and ``generate_stream`` (per-frame keys
        are fold_in(utterance key, frame index) — schedule-invariant)."""
        if stream:
            chunks = list(
                self.generate_stream(
                    text, speaker, context, max_audio_length_ms, temperature, topk,
                    cached_context=cached_context, seed=seed,
                )
            )
            if not chunks:
                return np.zeros((0,), np.float32)
            return np.concatenate(chunks)

        K = self._cfg.audio_num_codebooks
        max_gen = int(max_audio_length_ms / FRAME_MS)
        key_prefill, utt_key = self._utterance_keys(seed)
        frame, state, done, max_gen = self._prefill_utterance(
            text, speaker, context, cached_context, max_gen, temperature, topk,
            key=key_prefill,
        )
        if bool(done[0]):
            return np.zeros((0,), np.float32)
        device_chunks = self._decode_loop(frame, state, done, max_gen,
                                          temperature, topk, utt_key)

        # Codes never leave the device.  Invalid/overshoot frames are
        # zeros forming a strict suffix, so a bucket-padded decode is
        # byte-identical to decode_audio() of the valid prefix up to the
        # trim point (causal codec).
        total = 1 + sum(n for _, n in device_chunks)
        ns = tuple(n for _, n in device_chunks)
        if len(device_chunks) <= 1:
            # common case (budget fits one decode chunk): the whole tail is
            # ONE fused program + ONE fetch — code assembly, the offline
            # Mimi decode, flags packed next to the PCM.  Only taken for a
            # single chunk: (ns, bucket) are static, and each distinct pair
            # recompiles the full Mimi decode (minutes on the remote
            # compile service) — the schedule bounds single-chunk variants.
            bucket = max(32, -(-total // 32) * 32)
            if self._codec_device is not None:
                frame = jax.device_put(frame, self._codec_device)
                chunks_c = tuple(
                    jax.device_put(p, self._codec_device)
                    for p, _ in device_chunks
                )
            else:
                chunks_c = tuple(p for p, _ in device_chunks)
            packed_all = self._finalize_offline(
                self._mimi_params, frame, chunks_c, ns, bucket
            )
            arr = np.asarray(packed_all)
            n_frames = 1
            if device_chunks:
                n_frames += sum(
                    f.shape[0]
                    for f in self._unpack_chunks(arr, device_chunks, max_gen)
                )
            wav = arr[sum(n * K + n + 1 for n in ns):].view(np.float32)
            return wav[: n_frames * self._hop]

        # multi-chunk (ramped schedule / EOS-early): device-side code
        # assembly + pow2-bucket Mimi (bounded compile set), flags fetch
        # riding under the Mimi execution
        parts = [frame[:, None, :]] + [
            p[: n * K].reshape(n, 1, K).transpose(1, 0, 2)
            for p, n in device_chunks
        ]
        bucket = 1 << (total - 1).bit_length()
        codes = jnp.concatenate(parts, axis=1)  # (1, T, K)
        codes = jnp.pad(codes, ((0, 0), (0, bucket - total), (0, 0)))
        codes = codes.transpose(0, 2, 1)
        if self._codec_device is not None:
            codes = jax.device_put(codes, self._codec_device)
        wav_dev = self._mimi_decode(self._mimi_params, codes)

        if self._codec_device is None:
            # flags + PCM travel in ONE fetch (~30 ms round trip each on
            # this remote-attached TPU); the concatenate/bitcast are tiny
            # device ops riding behind the Mimi decode
            arr = np.asarray(jnp.concatenate(
                [p for p, _ in device_chunks]
                + [jax.lax.bitcast_convert_type(wav_dev, jnp.int32)]
            ))
            flags_len = sum(n * K + n + 1 for _, n in device_chunks)
            arr_all, wav_np = arr[:flags_len], arr[flags_len:].view(np.float32)
        else:  # two-chip split: flags live on the model chip, PCM on codec
            arr_all = self._fetch_chunks(device_chunks)
            wav_np = np.asarray(wav_dev)
        n_frames = 1 + sum(
            f.shape[0] for f in self._unpack_chunks(arr_all, device_chunks, max_gen)
        )
        return wav_np[: n_frames * self._hop]

    def _decode_loop(self, frame, state, done, max_gen, temperature, topk,
                     utt_key=None):
        """Run the chunked decode scans; return (packed, n) device handles.

        Device→host fetches cost a full round trip on remote-attached TPUs,
        so the loop fetches ONLY the lag-1 chunk's tiny `done` flag (hidden
        behind the next chunk's execution); frames/valid stay on device.
        Chunk sizes ramp so long utterances take few dispatches while
        early-EOS waste stays small."""
        generated = 1
        device_chunks = []  # (packed, n) device handles
        prev_packed = None
        base = self._offline_chunk_frames
        schedule = iter(self._chunk_schedule(base))
        if utt_key is None:
            utt_key = self._next_key()
        while generated < max_gen:
            # dispatch only schedule sizes (arbitrary tail sizes would each
            # compile a fresh program on the minutes-slow remote compile
            # service). When the ramp value overshoots the remaining
            # budget, DESCEND-fit: the largest schedule size ≤ remaining
            # (bottoming at base), so total overshoot stays < base frames.
            # The old smallest-size-covering fit decoded up to base·2^k−1
            # frames past the budget — ~180 ms of pure waste at the
            # default schedule on a 10 s utterance.
            n = next(schedule)
            remaining = max_gen - generated
            if n > remaining:
                n = self._fit_chunk(remaining, base)
            packed, frame, done, state = self._decode_packed(
                self._params, state, frame, done, utt_key, n,
                jnp.float32(temperature), topk, jnp.int32(generated),
            )
            generated += n
            device_chunks.append((packed, n))
            # lag-1 EOS check: the previous chunk's packed buffer is ready
            # by now (current chunk executes meanwhile); one fetch per chunk
            if prev_packed is not None and bool(np.asarray(prev_packed)[-1]):
                break
            prev_packed = packed
        return device_chunks

    def _unpack_chunks(self, arr_all, device_chunks, max_gen):
        """Packed int32 host buffer → list of (F_i, K) valid frame arrays."""
        K = self._cfg.audio_num_codebooks
        out = []
        budget = max_gen - 1  # frames allowed after the prefill frame
        off = 0
        for _, n in device_chunks:
            arr = arr_all[off : off + n * K + n + 1]
            off += n * K + n + 1
            frames_np = arr[: n * K].reshape(n, K)
            valid_np = arr[n * K : n * K + n].astype(bool)
            take = min(budget, n)
            out.append(frames_np[:take][valid_np[:take]])
            budget -= take
            if budget <= 0:
                break
        return out

    def _fetch_chunks(self, device_chunks) -> np.ndarray:
        # ONE fetch for all chunks: concatenating the device-resident packed
        # buffers is a single cheap XLA op, and each np.asarray here is a
        # ~30 ms network round trip on this remote-attached TPU
        return np.asarray(
            jnp.concatenate([p for p, _ in device_chunks])
            if len(device_chunks) > 1
            else device_chunks[0][0]
        )

    def generate_frames(
        self, text, speaker, context, max_audio_length_ms=90_000,
        temperature: float = 0.7, topk: int = 30, cached_context=None,
        seed: Optional[int] = None,
    ) -> np.ndarray:
        """→ (F, K) int32 valid frames (no EOS frame)."""
        K = self._cfg.audio_num_codebooks
        max_gen = int(max_audio_length_ms / FRAME_MS)
        key_prefill, utt_key = self._utterance_keys(seed)

        frame, state, done, max_gen = self._prefill_utterance(
            text, speaker, context, cached_context, max_gen, temperature, topk,
            key=key_prefill,
        )
        if bool(done[0]):
            return np.zeros((0, K), np.int32)
        out = [np.asarray(frame)]

        device_chunks = self._decode_loop(frame, state, done, max_gen,
                                          temperature, topk, utt_key)
        if device_chunks:
            arr_all = self._fetch_chunks(device_chunks)
            out.extend(self._unpack_chunks(arr_all, device_chunks, max_gen))
        return np.concatenate(out)

    def _chunk_schedule(self, base: Optional[int] = None):
        """Ramped decode-chunk sizes: fast EOS detection early, few
        dispatch boundaries for long generations."""
        n = base or self._decode_chunk_frames
        while True:
            yield n
            n = min(n * 2, 200)

    def _fit_chunk(self, remaining: int, base: Optional[int] = None) -> int:
        """Largest schedule size ≤ ``remaining`` (descend-fit), bottoming
        at ``base`` — keeps the compile set bounded to the ramp sizes
        while bounding budget overshoot to < base frames."""
        base = base or self._decode_chunk_frames
        best = base
        n = base
        while n <= min(remaining, 200):
            best = n
            if n >= 200:
                break
            n = min(n * 2, 200)
        return best

    def decode_audio(self, frames: np.ndarray) -> np.ndarray:
        """(F, K) frames → (F*hop,) float PCM via one offline Mimi pass,
        F bucketed (causal decoder ⇒ padding is exact)."""
        F = frames.shape[0]
        bucket = 1 << (F - 1).bit_length()
        codes = np.zeros((1, frames.shape[1], bucket), np.int32)
        codes[0, :, :F] = frames.T
        codes_dev = (
            jax.device_put(codes, self._codec_device)
            if self._codec_device is not None
            else jnp.asarray(codes)
        )
        wav = self._mimi_decode(self._mimi_params, codes_dev)
        return np.asarray(wav[: F * self._hop])
