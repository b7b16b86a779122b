"""Qwen3-TTS: Talker + CodePredictor two-level AR synthesis, TPU-native.

Reference behavior (/root/reference/crane-core/src/models/qwen3_tts/
modeling.rs): a 12.5 Hz frame loop where the **Talker** (Qwen3-style decoder
with QK-norm, rope theta 1e6) predicts the first codebook token from its last
hidden state (:473-744), and the **CodePredictor** (small decoder sharing the
same block, one lm_head + codec_embedding per group) autoregressively fills
the other ``num_code_groups-1`` codebooks conditioned on the talker hidden +
code-0 embedding (:259-472). The next talker input is the SUM of all 16
codec embeddings plus the next trailing-text embedding (streaming text
guidance, :1440-1456).

Prefill layout (:579-715): role prefix ``text_proj([im_start, assistant,
newline])`` + codec control tokens ``[think/nothink, think_bos, (lang,)
think_eos, (spk,) pad, bos]`` overlaid with ``tts_pad``*(n-2)+``tts_bos``
projections + (first text token + codec_bos).

Sampling matches the vendor defaults: top-k 50 then top-p with temperature
(:1360-1367), suppress of the last-1024 control ids except EOS, EOS
suppressed for the first 2 frames (min_new_tokens=2, :1370-1384); repetition
penalty on code-0 history.

Streaming: ``prepare_streaming`` / ``generate_one_frame`` (:1497-1658)
expose the frame-by-frame loop the serving layer streams from. Voice clone
(:746-915, :1659-1760): ECAPA x-vector spliced into the codec prefix, ICL
prompt = [ref_text + target_text + tts_eos] overlaid on [codec_bos +
summed ref codec embeds].

Checkpoint layout is the released HF ``Qwen3TTSForConditionalGeneration``:
``talker.model.*`` / ``talker.codec_head`` / ``talker.text_projection`` /
``talker.code_predictor.*`` / ``speaker_encoder.*``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from crane_tpu.generation.config import SpeechOptions
from crane_tpu.models.modules.transformer import (
    TransformerConfig,
    forward_hidden,
    make_cache,
    make_rope_tables,
)
from crane_tpu.ops.sampling import SamplingParams, sample, update_recent
from crane_tpu.utils.buckets import bucket_length

ROLE_PREFIX_IDS = (151644, 77091, 198)  # <|im_start|>, "assistant", "\n"
REP_WINDOW = 128  # code-0 repetition-penalty window (static shape)

# ISO 639-1 <-> the full English names codec_language_id uses as keys
# (reference crane/src/audio/tts_qwen3.rs:16-59); unknown codes, "auto", and
# already-full names pass through unchanged so both formats work.
LANGUAGE_NAME_TO_CODE = {
    "chinese": "zh", "english": "en", "german": "de", "italian": "it",
    "portuguese": "pt", "spanish": "es", "japanese": "ja", "korean": "ko",
    "french": "fr", "russian": "ru",
}
LANGUAGE_CODE_TO_NAME = {v: k for k, v in LANGUAGE_NAME_TO_CODE.items()}


@dataclasses.dataclass
class TalkerSpecials:
    """Non-hashable config bits: control-token ids and name maps."""

    vocab_size: int
    codec_eos: int
    codec_think: int
    codec_nothink: int
    codec_think_bos: int
    codec_think_eos: int
    codec_pad: int
    codec_bos: int
    language_ids: dict
    speaker_ids: dict
    spk_is_dialect: dict
    tts_bos: int = 151672
    tts_eos: int = 151673
    tts_pad: int = 151671


def _tcfg_from_hf(c: dict) -> TransformerConfig:
    return TransformerConfig(
        vocab_size=c["vocab_size"],
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        num_heads=c["num_attention_heads"],
        num_kv_heads=c["num_key_value_heads"],
        head_dim=c.get("head_dim", 128),
        intermediate_size=c["intermediate_size"],
        rms_norm_eps=c.get("rms_norm_eps", 1e-6),
        rope_theta=c.get("rope_theta", 1e6),
        max_position_embeddings=c.get("max_position_embeddings", 32768),
        qk_norm=True,
        attn_bias=c.get("attention_bias", False),
        tie_word_embeddings=False,
    )


# ── jitted steps ──────────────────────────────────────────────────────────


@functools.partial(jax.jit, static_argnums=(0,))
def _prefill_embeds(cfg, params, rope, cache, embeds, true_length):
    B, S, _ = embeds.shape
    tokens = jnp.zeros((B, S), jnp.int32)
    hidden, new_cache = forward_hidden(
        cfg, params, tokens, cache, jnp.asarray(0, jnp.int32), rope,
        inputs_embeds=embeds, true_lengths=jnp.asarray([true_length]),
    )
    last = jax.lax.dynamic_slice_in_dim(hidden, true_length - 1, 1, axis=1)
    new_cache = dataclasses.replace(new_cache, lengths=jnp.asarray([true_length]))
    return last, new_cache


@functools.partial(jax.jit, static_argnums=(0,), donate_argnums=(3,))
def _step_embed(cfg, params, rope, cache, embed):
    hidden, new_cache = forward_hidden(
        cfg, params, jnp.zeros((1, 1), jnp.int32), cache, cache.lengths, rope,
        inputs_embeds=embed,
    )
    return hidden, new_cache


@functools.partial(jax.jit, static_argnums=(0,))
def _sample_first_code(
    cfg, params, hidden, recent, key, suppress_mask, eos_mask, step, sp
):
    """codec_head logits + suppress masks + top-k/top-p sample -> code0."""
    logits = (hidden[:, 0] @ params["codec_head"]).astype(jnp.float32)
    logits = logits + suppress_mask[None, :]
    logits = jnp.where(step < 2, logits + eos_mask[None, :], logits)
    return sample(logits, sp, recent, key)


def _predict_rest_codes(pcfg, n_groups, p, talker_hidden, code0, key, sp):
    """CodePredictor: 2-token prefill [talker_hidden, embed(code0)], then
    n_groups-1 AR steps with per-group heads/embeddings (lax.scan)."""
    proj = lambda x: x if "mtp_w" not in p else (x @ p["mtp_w"] + p["mtp_b"])
    e0 = p["codec_embedding0"][code0][:, None, :]  # [1, 1, Dt]
    pre = jnp.concatenate([talker_hidden, e0], axis=1)
    pre = proj(pre).astype(p["tree"]["embed"].dtype)

    cache = make_cache(pcfg, 1, 32, pre.dtype)
    hidden, cache = forward_hidden(
        pcfg, p["tree"], jnp.zeros((1, 2), jnp.int32), cache,
        jnp.asarray(0, jnp.int32), make_rope_tables(pcfg),
        inputs_embeds=pre,
    )
    h_last = hidden[:, -1:]
    rope = make_rope_tables(pcfg)
    recent = jnp.full((1, 4), -1, jnp.int32)

    def body(carry, g):
        cache, h, key = carry
        head = p["lm_heads"][g]  # [Dp, V]
        logits = (h[:, 0] @ head).astype(jnp.float32)
        key, sub = jax.random.split(key)
        code = sample(logits, sp, recent, sub)
        emb = p["codec_embeddings"][g][code][:, None, :]  # [1, 1, Dt]
        emb = proj(emb).astype(h.dtype)
        h2, cache2 = forward_hidden(
            pcfg, p["tree"], jnp.zeros((1, 1), jnp.int32), cache,
            cache.lengths, rope, inputs_embeds=emb,
        )
        return (cache2, h2, key), code[0]

    (_, _, _), codes = jax.lax.scan(
        body, (cache, h_last, key), jnp.arange(n_groups - 1)
    )
    return codes  # [n_groups - 1]


@functools.partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(5,))
def _advance_frame(tcfg, pcfg, n_groups, params, rope, cache, talker_hidden,
                   code0, guidance, key, sp):
    """One fused frame advance: CodePredictor rest-codes + summed codec
    embedding + talker step. A single dispatch (the per-group host loop
    costs ~10 ms RPC per lookup on a remote TPU runtime) with the KV cache
    donated so each frame updates in place instead of reallocating it."""
    p = params["pred"]
    rest = _predict_rest_codes(pcfg, n_groups, p, talker_hidden, code0, key, sp)
    emb = params["talker"]["tree"]["embed"][code0][:, None, :]
    emb = emb + jnp.sum(
        p["codec_embeddings"][jnp.arange(n_groups - 1), rest], axis=0
    )[None, None, :]
    emb = emb + guidance
    hidden, new_cache = forward_hidden(
        tcfg, params["talker"]["tree"], jnp.zeros((1, 1), jnp.int32), cache,
        cache.lengths, rope, inputs_embeds=emb.astype(talker_hidden.dtype),
    )
    return rest, hidden, new_cache


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(6,))
def _gen_frame_block(tcfg, pcfg, n_groups, n_frames, params, rope, cache,
                     hidden, recent, step, trailing_pad, key, sp,
                     suppress, eos_suppress, eos_id):
    """``n_frames`` full frames in ONE device dispatch (lax.scan over the
    per-frame body). Emits ``[n_frames, n_groups]`` codes plus per-frame EOS
    flags; the host truncates at the first flag — frames computed past EOS
    are garbage and discarded, which keeps the scan body select-free (no
    full-KV masking traffic). This is the TPU-shaped replacement for the
    reference's host-driven generate_one_frame loop (modeling.rs:1575-1651):
    at 12.5 Hz a per-frame host roundtrip alone eats most of the 80 ms frame
    budget on a remote runtime."""
    tree = params["talker"]["tree"]

    def body(carry, _):
        cache, hidden, recent, step, key = carry
        key, k1, k2 = jax.random.split(key, 3)
        logits = (hidden[:, 0] @ params["talker"]["codec_head"]).astype(jnp.float32)
        logits = logits + suppress[None, :]
        logits = jnp.where(step < 2, logits + eos_suppress[None, :], logits)
        code0 = sample(logits, sp, recent, k1)
        is_eos = code0[0] == eos_id
        rest = _predict_rest_codes(pcfg, n_groups, params["pred"], hidden, code0, k2, sp)
        emb = tree["embed"][code0][:, None, :]
        emb = emb + jnp.sum(
            params["pred"]["codec_embeddings"][jnp.arange(n_groups - 1), rest],
            axis=0,
        )[None, None, :]
        emb = emb + jax.lax.dynamic_slice_in_dim(trailing_pad, step, 1, axis=1)
        hidden, cache = forward_hidden(
            tcfg, tree, jnp.zeros((1, 1), jnp.int32), cache, cache.lengths,
            rope, inputs_embeds=emb.astype(hidden.dtype),
        )
        recent = update_recent(recent, code0)
        frame = jnp.concatenate([code0, rest])
        return (cache, hidden, recent, step + 1, key), (frame, is_eos)

    (cache, hidden, recent, step, key), (frames, eos) = jax.lax.scan(
        body, (cache, hidden, recent, step, key), None, length=n_frames
    )
    return frames, eos, cache, hidden, recent, step, key


@dataclasses.dataclass
class StreamingState:
    """prepare_streaming/generate_one_frame state (reference :1225-1248)."""

    cache: object
    past_hidden: jax.Array
    step: int
    trailing: jax.Array  # [1, n_trailing, D]
    tts_pad_embed: jax.Array  # [1, 1, D]
    recent0: jax.Array  # code-0 repetition window
    key: jax.Array
    sp: SamplingParams
    codes: list
    # trailing + tts_pad pre-concatenated to a bucketed length so the
    # block-scan can dynamic-slice per-step guidance in-graph
    trailing_pad: Optional[jax.Array] = None
    finished: bool = False


class Qwen3TTSModel:
    def __init__(
        self,
        talker_cfg: TransformerConfig,
        pred_cfg: TransformerConfig,
        specials: TalkerSpecials,
        params: dict,
        *,
        num_code_groups: int = 16,
        tokenizer=None,
        decoder=None,
        speaker_encoder=None,
        dtype=jnp.float32,
    ):
        self.tcfg = talker_cfg
        self.pcfg = pred_cfg
        self.sp_tokens = specials
        self.params = params
        self.num_code_groups = num_code_groups
        self.tokenizer = tokenizer
        self.decoder = decoder
        self.speaker_encoder = speaker_encoder
        self.dtype = dtype
        self.rope = make_rope_tables(talker_cfg)
        # optional audio -> [T, n_groups] codes encoder (Mimi-style, from the
        # speech tokenizer's encoder weights) for voice-clone reference audio
        self.ref_encoder = None

        V = specials.vocab_size
        sup = np.zeros(V, np.float32)
        sup[max(V - 1024, 0):] = -np.inf
        sup[specials.codec_eos] = 0.0
        self._suppress = jnp.asarray(sup)
        eos_m = np.zeros(V, np.float32)
        eos_m[specials.codec_eos] = -np.inf
        self._eos_suppress = jnp.asarray(eos_m)

    # ── embedding helpers ────────────────────────────────────────────────
    def _text_proj(self, emb: jax.Array) -> jax.Array:
        p = self.params["talker"]
        return jax.nn.silu(emb @ p["text_fc1_w"] + p["text_fc1_b"]) @ p["text_fc2_w"] + p["text_fc2_b"]

    def _text_embed(self, ids) -> jax.Array:
        return self._text_proj(
            self.params["talker"]["text_embedding"][jnp.asarray(ids, jnp.int32)][None]
        )

    def _codec_embed(self, ids) -> jax.Array:
        return self.params["talker"]["tree"]["embed"][jnp.asarray(ids, jnp.int32)][None]

    def _language_id(self, language: str, speaker: Optional[str]) -> Optional[int]:
        s = self.sp_tokens
        lang = LANGUAGE_CODE_TO_NAME.get(language.lower(), language.lower())
        lid = None if lang == "auto" else s.language_ids.get(lang)
        if speaker and lang in ("chinese", "auto"):
            d = s.spk_is_dialect.get(speaker.lower())
            if isinstance(d, str):
                lid = s.language_ids.get(d, lid)
        return lid

    def build_prefill_embeds(self, text_ids: Sequence[int], language: str, speaker: Optional[str]):
        """Reference build_prefill_embeds (:579-715). Returns
        (prefill [1,S,D], trailing [1,N,D], tts_pad [1,1,D])."""
        s = self.sp_tokens
        role = self._text_embed(ROLE_PREFIX_IDS)  # [1, 3, D]
        tts = self._text_embed([s.tts_pad, s.tts_bos, s.tts_eos])
        tts_pad, tts_bos, tts_eos = tts[:, 0:1], tts[:, 1:2], tts[:, 2:3]

        lid = self._language_id(language, speaker)
        sid = s.speaker_ids.get(speaker.lower()) if speaker else None
        codec_ids = (
            [s.codec_think, s.codec_think_bos, lid, s.codec_think_eos]
            if lid is not None
            else [s.codec_nothink, s.codec_think_bos, s.codec_think_eos]
        )
        if sid is not None:
            codec_ids.append(sid)
        codec_ids += [s.codec_pad, s.codec_bos]
        codec = self._codec_embed(codec_ids)  # [1, N, D]
        n = codec.shape[1]
        overlay = jnp.concatenate(
            [jnp.broadcast_to(tts_pad, (1, n - 2, tts_pad.shape[2])), tts_bos], axis=1
        )
        codec_hidden = overlay + codec[:, : n - 1]

        text_ids = list(text_ids)
        first = (
            self._text_embed(text_ids[:1]) if text_ids else tts_pad
        ) + codec[:, n - 1 :]
        prefill = jnp.concatenate([role, codec_hidden, first], axis=1)

        if len(text_ids) > 1:
            trailing = jnp.concatenate([self._text_embed(text_ids[1:]), tts_eos], axis=1)
        else:
            trailing = tts_eos
        return (
            prefill.astype(self.dtype),
            trailing.astype(self.dtype),
            tts_pad.astype(self.dtype),
        )

    # ── streaming loop ───────────────────────────────────────────────────
    def prepare_streaming(
        self,
        text_ids: Sequence[int],
        language: str = "auto",
        speaker: Optional[str] = None,
        opts: SpeechOptions | None = None,
        *,
        prefill_embeds: jax.Array | None = None,
        trailing: jax.Array | None = None,
        tts_pad: jax.Array | None = None,
    ) -> StreamingState:
        opts = opts or SpeechOptions()
        if prefill_embeds is None:
            prefill_embeds, trailing, tts_pad = self.build_prefill_embeds(
                text_ids, language, speaker
            )
        S = prefill_embeds.shape[1]
        s_bucket = bucket_length(S, floor=32)
        padded = jnp.pad(prefill_embeds, ((0, 0), (0, s_bucket - S), (0, 0)))
        max_seq = bucket_length(S + getattr(opts, "max_new_tokens", 2048), floor=512)
        cache = make_cache(self.tcfg, 1, max_seq, self.dtype)
        hidden, cache = _prefill_embeds(
            self.tcfg, self.params["talker"]["tree"], self.rope, cache,
            padded, jnp.asarray(S, jnp.int32),
        )
        sp = SamplingParams.make(
            1,
            temperature=getattr(opts, "temperature", 0.9) or 0.9,
            top_k=50,
            top_p=getattr(opts, "top_p", 1.0) or 1.0,
            repetition_penalty=getattr(opts, "repetition_penalty", 1.05) or 1.0,
            do_sample=True,
        )
        n_total = bucket_length(
            trailing.shape[1] + getattr(opts, "max_new_tokens", 2048) + 1,
            floor=256,
        )
        trailing_pad = jnp.concatenate(
            [
                trailing,
                jnp.broadcast_to(
                    tts_pad, (1, n_total - trailing.shape[1], tts_pad.shape[2])
                ),
            ],
            axis=1,
        )
        return StreamingState(
            cache=cache,
            past_hidden=hidden,
            step=0,
            trailing=trailing,
            tts_pad_embed=tts_pad,
            recent0=jnp.full((1, REP_WINDOW), -1, jnp.int32),
            key=jax.random.PRNGKey(getattr(opts, "seed", 42)),
            sp=sp,
            codes=[],
            trailing_pad=trailing_pad,
        )

    def generate_one_frame(self, state: StreamingState) -> Optional[list[int]]:
        """One 12.5 Hz frame: sample code0 (None on EOS), fill the other
        groups, advance the talker. Reference :1575-1651."""
        s = self.sp_tokens
        state.key, k1, k2 = jax.random.split(state.key, 3)
        code0 = _sample_first_code(
            self.tcfg, self.params["talker"], state.past_hidden, state.recent0,
            k1, self._suppress, self._eos_suppress,
            jnp.asarray(state.step, jnp.int32), state.sp,
        )
        c0 = int(code0[0])
        if c0 == s.codec_eos:
            return None
        # trailing text guidance for this step (host knows the step index)
        if state.step < state.trailing.shape[1]:
            guidance = jax.lax.dynamic_slice_in_dim(
                state.trailing, state.step, 1, axis=1
            )
        else:
            guidance = state.tts_pad_embed
        rest, hidden, state.cache = _advance_frame(
            self.tcfg, self.pcfg, self.num_code_groups, self.params,
            self.rope, state.cache, state.past_hidden, code0, guidance, k2,
            state.sp,
        )
        frame = [c0] + np.asarray(rest).tolist()
        state.past_hidden = hidden
        state.recent0 = update_recent(state.recent0, code0)
        state.step += 1
        state.codes.append(frame)
        return frame

    def generate_frames(
        self, state: StreamingState, n_frames: int = 8
    ) -> Optional[np.ndarray]:
        """Up to ``n_frames`` frames in ONE device dispatch (block
        streaming). Returns ``[k, num_code_groups]`` int32 with
        ``k < n_frames`` iff EOS was hit inside the block, or ``None`` if
        the very first frame was EOS / the state is finished."""
        if state.finished:
            return None
        if state.trailing_pad is None:  # state built by an older prepare path
            n_total = bucket_length(state.trailing.shape[1] + 2048 + 1, floor=256)
            state.trailing_pad = jnp.concatenate(
                [
                    state.trailing,
                    jnp.broadcast_to(
                        state.tts_pad_embed,
                        (1, n_total - state.trailing.shape[1],
                         state.tts_pad_embed.shape[2]),
                    ),
                ],
                axis=1,
            )
        frames, eos, state.cache, state.past_hidden, state.recent0, step, state.key = (
            _gen_frame_block(
                self.tcfg, self.pcfg, self.num_code_groups, n_frames,
                self.params, self.rope, state.cache, state.past_hidden,
                state.recent0, jnp.asarray(state.step, jnp.int32),
                state.trailing_pad, state.key, state.sp, self._suppress,
                self._eos_suppress,
                jnp.asarray(self.sp_tokens.codec_eos, jnp.int32),
            )
        )
        eos_np = np.asarray(eos)
        k = int(np.argmax(eos_np)) if eos_np.any() else n_frames
        state.step += k  # host view: frames actually kept
        if k < n_frames:
            state.finished = True  # device state ran past EOS; do not resume
        if k == 0:
            return None
        out = np.asarray(frames[:k], np.int32)
        state.codes.extend(out.tolist())
        return out

    def generate_speech_codes(
        self,
        text_ids: Sequence[int],
        language: str = "auto",
        speaker: Optional[str] = None,
        opts: SpeechOptions | None = None,
        *,
        block_frames: int = 16,
    ) -> np.ndarray:
        """Block loop over :meth:`generate_frames` (reference's per-frame
        loop, :1327-1490, reshaped into device-side scans). Returns
        ``[T, num_code_groups]`` int32."""
        opts = opts or SpeechOptions()
        state = self.prepare_streaming(text_ids, language, speaker, opts)
        budget = getattr(opts, "max_new_tokens", 2048)
        while budget > 0:
            out = self.generate_frames(state, block_frames)  # fixed block size
            if out is None or state.finished:
                break
            budget -= len(out)
        codes = np.asarray(state.codes, np.int32).reshape(-1, self.num_code_groups)
        return codes[: getattr(opts, "max_new_tokens", 2048)]

    # ── voice clone (ICL) ────────────────────────────────────────────────
    def build_voice_clone_prefill(self, spk_embed: jax.Array, language: str):
        """Reference :746-827: role prefix + codec control tokens with the
        speaker x-vector spliced between think_eos and pad; no codec_bos."""
        s = self.sp_tokens
        role = self._text_embed(ROLE_PREFIX_IDS)
        tts = self._text_embed([s.tts_pad, s.tts_bos])
        tts_pad, tts_bos = tts[:, 0:1], tts[:, 1:2]
        lid = self._language_id(language, None)
        prefix_ids = (
            [s.codec_think, s.codec_think_bos, lid, s.codec_think_eos]
            if lid is not None
            else [s.codec_nothink, s.codec_think_bos, s.codec_think_eos]
        )
        prefix = self._codec_embed(prefix_ids)
        spk = jnp.asarray(spk_embed).reshape(1, 1, -1).astype(prefix.dtype)
        suffix = self._codec_embed([s.codec_pad, s.codec_bos])
        codec_full = jnp.concatenate([prefix, spk, suffix], axis=1)
        n = codec_full.shape[1]
        overlay = jnp.concatenate(
            [jnp.broadcast_to(tts_pad, (1, n - 2, tts_pad.shape[2])), tts_bos], axis=1
        )
        codec_hidden = overlay + codec_full[:, : n - 1]
        prefill = jnp.concatenate([role, codec_hidden], axis=1)
        return prefill.astype(self.dtype), tts_pad.astype(self.dtype)

    def sum_codec_embeds(self, codes: np.ndarray) -> jax.Array:
        """ref codes ``[T, n_groups]`` -> summed embeddings ``[1, T, D]``."""
        codes = jnp.asarray(np.asarray(codes), jnp.int32)
        emb = self.params["talker"]["tree"]["embed"][codes[:, 0]]
        for g in range(1, codes.shape[1]):
            emb = emb + self.params["pred"]["codec_embeddings"][g - 1][codes[:, g]]
        return emb[None]

    def build_icl_prompt(self, target_ids, ref_ids, ref_codec_embeds):
        """Reference :839-915, streaming overlay mode."""
        s = self.sp_tokens
        text = self._text_embed(list(ref_ids) + list(target_ids) + [s.tts_eos])
        bos = self._codec_embed([s.codec_bos])
        codec = jnp.concatenate([bos, ref_codec_embeds.astype(bos.dtype)], axis=1)
        n_text, n_codec = text.shape[1], codec.shape[1]
        tts_pad = self._text_embed([s.tts_pad])
        if n_text > n_codec:
            icl = text[:, :n_codec] + codec
            trailing = text[:, n_codec:]
        else:
            if n_codec > n_text:
                pad = jnp.broadcast_to(tts_pad, (1, n_codec - n_text, text.shape[2]))
                text = jnp.concatenate([text, pad], axis=1)
            icl = text + codec
            trailing = tts_pad
        return icl.astype(self.dtype), trailing.astype(self.dtype)

    def generate_voice_clone_codes(
        self,
        text_ids: Sequence[int],
        ref_ids: Sequence[int],
        ref_codes: np.ndarray,
        spk_embed: jax.Array,
        language: str = "auto",
        opts: SpeechOptions | None = None,
    ) -> np.ndarray:
        """Reference :1659-1760: combined [prefill + ICL] single prefill,
        then the standard frame loop with ICL guardrails."""
        opts = opts or SpeechOptions()
        rep = max(getattr(opts, "repetition_penalty", 1.05) or 1.05, 1.05)
        max_frames = min(
            getattr(opts, "max_new_tokens", 2048), max(75, len(list(text_ids)) * 6)
        )
        prefill, tts_pad = self.build_voice_clone_prefill(spk_embed, language)
        icl, trailing = self.build_icl_prompt(
            text_ids, ref_ids, self.sum_codec_embeds(ref_codes)
        )
        combined = jnp.concatenate([prefill, icl], axis=1)
        opts2 = dataclasses.replace(opts, repetition_penalty=rep) if hasattr(opts, "repetition_penalty") else opts
        state = self.prepare_streaming(
            [], language, None, opts2,
            prefill_embeds=combined, trailing=trailing, tts_pad=tts_pad,
        )
        for _ in range(max_frames):
            if self.generate_one_frame(state) is None:
                break
        return np.asarray(state.codes, np.int32).reshape(-1, self.num_code_groups)

    def encode_reference(self, audio: np.ndarray) -> np.ndarray:
        """Reference audio -> codec codes ``[T, n_groups]`` via the speech
        tokenizer's Mimi encoder (reference speech_tokenizer_v2.rs:1584-1594).
        Voice clone also accepts precomputed codes directly."""
        if self.ref_encoder is None:
            raise ValueError(
                "speech tokenizer encoder not loaded; pass ref_codes to "
                "generate_voice_clone_codes directly"
            )
        return self.ref_encoder(np.asarray(audio, np.float32))

    # ── top-level synthesis ──────────────────────────────────────────────
    def generate_speech(
        self, text: str, language: str = "auto", speaker: Optional[str] = None,
        opts: SpeechOptions | None = None,
    ) -> tuple[np.ndarray, int]:
        """text -> (waveform f32 [N], sample_rate). Decoder required."""
        if self.tokenizer is None or self.decoder is None:
            raise ValueError("tokenizer and speech decoder required")
        ids = self.tokenizer.encode(text)
        codes = self.generate_speech_codes(ids, language, speaker, opts)
        if codes.shape[0] == 0:
            return np.zeros(0, np.float32), self.decoder.sample_rate
        audio = self.decoder.chunked_decode(codes[None], 300, 25)
        return audio[0], self.decoder.sample_rate


# ── loading ───────────────────────────────────────────────────────────────


def map_talker_weights(tcfg, pcfg, sd: dict, num_code_groups: int, dtype) -> dict:
    """HF Qwen3TTSForConditionalGeneration names -> params trees."""
    from crane_tpu.models.auto import map_hf_weights

    def sub(prefix):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    t_sd = sub("talker.")
    t_sd["model.embed_tokens.weight"] = t_sd["model.codec_embedding.weight"]
    t_sd["lm_head.weight"] = t_sd["codec_head.weight"]
    tree = map_hf_weights(tcfg, t_sd, dtype)
    a = lambda x: jnp.asarray(np.asarray(x), dtype)
    t = lambda x: jnp.asarray(np.asarray(x).T, dtype)
    talker = {
        "tree": tree,
        "codec_head": t(t_sd["codec_head.weight"]),
        "text_embedding": a(t_sd["model.text_embedding.weight"]),
        "text_fc1_w": t(t_sd["text_projection.linear_fc1.weight"]),
        "text_fc1_b": a(t_sd["text_projection.linear_fc1.bias"]),
        "text_fc2_w": t(t_sd["text_projection.linear_fc2.weight"]),
        "text_fc2_b": a(t_sd["text_projection.linear_fc2.bias"]),
    }

    p_sd = sub("talker.code_predictor.")
    n = num_code_groups - 1
    p_sd["model.embed_tokens.weight"] = p_sd["model.codec_embedding.0.weight"]
    p_sd["lm_head.weight"] = p_sd["lm_head.0.weight"]
    ptree = map_hf_weights(pcfg, p_sd, dtype)
    pred = {
        "tree": ptree,
        "codec_embedding0": tree["embed"],  # talker codec embedding for code-0
        "codec_embeddings": jnp.stack(
            [a(p_sd[f"model.codec_embedding.{i}.weight"]) for i in range(n)]
        ),
        "lm_heads": jnp.stack([t(p_sd[f"lm_head.{i}.weight"]) for i in range(n)]),
    }
    if "small_to_mtp_projection.weight" in p_sd:
        pred["mtp_w"] = t(p_sd["small_to_mtp_projection.weight"])
        pred["mtp_b"] = a(p_sd["small_to_mtp_projection.bias"])
    return {"talker": talker, "pred": pred}


def load_qwen3_tts(model_dir: str, *, dtype=jnp.float32, load_decoder: bool = True) -> Qwen3TTSModel:
    """Load a released Qwen3-TTS checkpoint directory; the RVQGAN speech
    tokenizer is expected under ``<dir>/speech_tokenizer`` (optional)."""
    import os

    from crane_tpu.loaders.safetensors_loader import load_state_dict
    from crane_tpu.models.auto import load_hf_config
    from crane_tpu.tokenizer.autotokenizer import AutoTokenizer

    hf = load_hf_config(model_dir)
    tc = hf["talker_config"]
    pc = tc["code_predictor_config"]
    tcfg = _tcfg_from_hf(tc)
    pcfg = _tcfg_from_hf(pc)
    specials = TalkerSpecials(
        vocab_size=tc["vocab_size"],
        codec_eos=tc.get("codec_eos_token_id", 0),
        codec_think=tc.get("codec_think_id", 0),
        codec_nothink=tc.get("codec_nothink_id", 0),
        codec_think_bos=tc.get("codec_think_bos_id", 0),
        codec_think_eos=tc.get("codec_think_eos_id", 0),
        codec_pad=tc.get("codec_pad_id", 0),
        codec_bos=tc.get("codec_bos_id", 0),
        language_ids={k.lower(): v for k, v in tc.get("codec_language_id", {}).items()},
        speaker_ids={k.lower(): v for k, v in tc.get("spk_id", {}).items()},
        spk_is_dialect={k.lower(): v for k, v in tc.get("spk_is_dialect", {}).items()},
        tts_bos=hf.get("tts_bos_token_id", 151672),
        tts_eos=hf.get("tts_eos_token_id", 151673),
        tts_pad=hf.get("tts_pad_token_id", 151671),
    )
    sd = load_state_dict(model_dir)
    params = map_talker_weights(
        tcfg, pcfg, sd, tc.get("num_code_groups", 16), dtype
    )

    speaker_encoder = None
    if any(k.startswith("speaker_encoder.") for k in sd):
        # base checkpoints ship the ECAPA x-vector tower for voice clone
        # (reference modeling.rs:1149-1223; model.rs:411-450)
        from crane_tpu.models.speaker_encoder import (
            EcapaConfig,
            SpeakerEncoder,
            map_speaker_encoder_weights,
        )

        sec = hf.get("speaker_encoder_config", {})
        ecfg = EcapaConfig(
            mel_dim=sec.get("mel_dim", 128),
            enc_dim=sec.get("enc_dim", 1024),
            enc_channels=tuple(sec.get("enc_channels", (512, 512, 512, 512, 1536))),
            enc_kernel_sizes=tuple(sec.get("enc_kernel_sizes", (5, 3, 3, 3, 1))),
            enc_dilations=tuple(sec.get("enc_dilations", (1, 2, 3, 4, 1))),
            enc_attention_channels=sec.get("enc_attention_channels", 128),
            enc_res2net_scale=sec.get("enc_res2net_scale", 8),
            enc_se_channels=sec.get("enc_se_channels", 128),
            sample_rate=sec.get("sample_rate", 24000),
        )
        speaker_encoder = SpeakerEncoder(ecfg, map_speaker_encoder_weights(ecfg, sd))

    decoder = None
    ref_encoder = None
    st_dir = os.path.join(model_dir, "speech_tokenizer")
    if load_decoder and os.path.isdir(st_dir):
        from crane_tpu.models.speech_tokenizer import (
            load_speech_tokenizer,
            load_speech_tokenizer_encoder,
        )

        decoder = load_speech_tokenizer(st_dir)
        # the same safetensors carry the Mimi-style encoder (prefix
        # ``encoder.*``) used to turn reference audio into codec codes for
        # ICL voice clone (reference speech_tokenizer_v2.rs:1548-1565)
        ref_encoder = load_speech_tokenizer_encoder(st_dir)

    tok = None
    try:
        tok = AutoTokenizer.from_pretrained(model_dir)
    except Exception:
        pass
    model = Qwen3TTSModel(
        tcfg, pcfg, specials, params,
        num_code_groups=tc.get("num_code_groups", 16),
        tokenizer=tok, decoder=decoder, dtype=dtype,
        speaker_encoder=speaker_encoder,
    )
    if ref_encoder is not None:
        model.ref_encoder = ref_encoder
    return model
