"""App layer: rolling context, LLM client plumbing, chat/storyteller
logic, duplex sentence streaming — all without gradio/network (mocked
LLM, tiny TTS)."""

import numpy as np
import pytest

from sesameai_tts_tpu.llm.client import LLMConfig, ModelManager
from sesameai_tts_tpu.runtime.context import RollingContext
from sesameai_tts_tpu.apps.duplex import sentence_stream


# ---------------------------------------------------------------------------
# rolling context
# ---------------------------------------------------------------------------


def _pair(rows, K=8):
    return (np.zeros((rows, K + 1), np.int32), np.zeros((rows, K + 1), bool))


def test_rolling_context_eviction():
    ctx = RollingContext(max_positions=300, generation_budget=100, text_budget=50)
    ctx.pin_prefix([_pair(60)])
    budget = ctx.budget
    assert 100 <= budget <= 200
    for _ in range(5):
        ctx.append(_pair(40))
    # prefix + window must stay within budget
    assert ctx.prefix_rows == 60
    assert ctx.total_rows <= budget
    # prefix is never evicted
    assert len(ctx.pairs()) >= 1


def test_rolling_context_max_segments():
    ctx = RollingContext(max_positions=10_000, max_segments=3)
    for _ in range(6):
        ctx.append(_pair(10))
    assert ctx.window_rows == 30


def test_rolling_context_prefix_too_big():
    ctx = RollingContext(max_positions=200, generation_budget=100, text_budget=50)
    with pytest.raises(ValueError, match="prefix"):
        ctx.pin_prefix([_pair(100)])
        ctx.append(_pair(10))


def test_rolling_context_oversized_segment_raises():
    """A segment that can never fit must raise, not silently vanish
    (eviction used to pop the just-appended turn and return normally)."""
    ctx = RollingContext(max_positions=300, generation_budget=100, text_budget=50)
    with pytest.raises(ValueError, match="cannot fit"):
        ctx.append(_pair(200))
    ctx.append(_pair(40))  # a fitting segment still works
    assert ctx.window_rows == 40


def test_rolling_context_oversize_trim_keeps_tail():
    """oversize='trim' (the duplex live-loop mode): an over-long turn
    keeps its TAIL rows instead of crashing the conversation."""
    import numpy as np

    ctx = RollingContext(max_positions=300, generation_budget=100, text_budget=50)
    t = np.arange(200)[:, None].repeat(9, 1).astype(np.int32)
    m = np.ones((200, 9), bool)
    ctx.append((t, m), oversize="trim")
    assert 0 < ctx.window_rows <= ctx.budget
    kept = ctx.pairs()[-1][0]
    assert kept[-1, 0] == 199  # the tail survived, not the head


# ---------------------------------------------------------------------------
# llm client
# ---------------------------------------------------------------------------


def test_model_alias_resolution():
    cfg = LLMConfig(MODEL_OPTIONS=["gpt-4o-mini", "llama-3-70b", "mistral-small"])
    mm = ModelManager(cfg)
    assert mm.resolve_model_alias("gpt-4o-mini") == "gpt-4o-mini"
    assert mm.resolve_model_alias("llama") == "llama-3-70b"
    assert mm.resolve_model_alias("MISTRAL") == "mistral-small"
    assert mm.resolve_model_alias("nope") is None


def test_history_manager():
    from sesameai_tts_tpu.llm.client import HistoryManager

    h = HistoryManager()
    h.add("user", "hi")
    h.add("assistant", "hello")
    assert len(h.messages) == 2
    h.clear_history()
    assert h.messages == []


# ---------------------------------------------------------------------------
# duplex sentence streaming
# ---------------------------------------------------------------------------


def test_sentence_stream_incremental():
    deltas = ["Hel", "lo there. How ", "are you? I am", " fine. trailing bit"]
    out = list(sentence_stream(iter(deltas)))
    assert out == ["Hello there.", "How are you?", "I am fine.", "trailing bit"]


def test_sentence_stream_waits_for_boundary_confirmation():
    # "1.5" must not split inside the number
    deltas = ["It costs 1", ".5 dollars today", ". Done."]
    out = list(sentence_stream(iter(deltas)))
    assert out == ["It costs 1.5 dollars today.", "Done."]


# ---------------------------------------------------------------------------
# chat app logic with mocked LLM + tiny TTS
# ---------------------------------------------------------------------------


class FakeLLM:
    def __init__(self, response="One sentence. Two sentences!"):
        self.response = response
        from sesameai_tts_tpu.llm.client import HistoryManager

        self.history_manager = HistoryManager()

    def query(self, q, plaintext_output=True, stream=False):
        if stream:
            return iter([self.response])
        return self.response


@pytest.fixture(scope="module")
def tiny_tts(tmp_path_factory):
    from sesameai_tts_tpu.audio.io import write_wav
    from sesameai_tts_tpu.runtime.loader import test_tiny_spec
    from sesameai_tts_tpu.service.tts import TTS

    root = tmp_path_factory.mktemp("voices")
    vdir = root / "v"
    vdir.mkdir()
    wav = (np.random.default_rng(0).normal(size=2400) * 0.1).astype(np.float32)
    write_wav(str(vdir / "c.wav"), wav, 24_000)
    (vdir / "c.txt").write_text("clip")
    tts = TTS(spec=test_tiny_spec(), voices=str(root), enable_watermark=False)
    tts.load_model()
    tts.load_voice("v", warmup=False)
    return tts


def test_chat_app_process_query(tiny_tts, monkeypatch):
    from sesameai_tts_tpu.apps.web_chat import ChatApp

    monkeypatch.setattr(
        "sesameai_tts_tpu.apps.web_base.AskLLM", lambda **kw: FakeLLM()
    )
    app = ChatApp(voice="v", model="local-default", tts=tiny_tts)
    outs = list(app.process_query("hello", temperature=0.9))
    final = outs[-1]
    msgs, status, start_idx, end_idx, active = final
    assert active
    assert end_idx - start_idx == 2  # two sentences queued
    assert msgs[-1]["role"] == "assistant"

    # drive the sentence loop to completion
    results = list(
        app.sentence_generator_loop(start_idx, end_idx, True, temperature=0.8, topk=5,
                                    speed_factor=1.0)
    )
    # last yield signals inactive
    assert results[-1][0] is False
    audio_yields = [a for act, a in results if a is not None]
    assert len(audio_yields) == 2
    sr, pcm = audio_yields[0]
    assert sr == 24_000 and pcm.dtype == np.float32


def test_storyteller_app(tiny_tts, monkeypatch, tmp_path):
    from sesameai_tts_tpu.apps.web_storyteller import StorytellerApp

    monkeypatch.setattr(
        "sesameai_tts_tpu.apps.web_base.AskLLM",
        lambda **kw: FakeLLM("Once upon a time. The crab left home."),
    )
    app = StorytellerApp(voice="v", model="local-default", tts=tiny_tts)
    outs = list(app.continue_story("begin the story", use_llm=True))
    _, status, s, e, active, replay = outs[-1]
    assert active and e - s == 2
    assert replay is None  # nothing narrated yet — no replay
    assert "Once upon a time." in app.story_text

    drained = list(app.sentence_generator_loop(s, e, True, temperature=0.8, topk=5))
    assert drained[-1][0] is False
    # prompt group saved on drain
    import os

    assert any(p.endswith(".wav") for p in app.temp_audio_files)
    full = app.combine_full_story()
    assert full and os.path.exists(full)

    # pasted-text mode bypasses the LLM; continuation replays the audio
    # narrated so far before the new sentences stream in (reference
    # web_storyteller.py:102-126)
    outs2 = list(app.continue_story("Direct text here.", use_llm=False))
    assert outs2[-1][4] is True
    sr, replay_pcm = outs2[-1][5]
    assert sr == 24_000 and replay_pcm.dtype == np.float32
    narrated = sum(len(c.samples) for g in app.prompt_audio_segments for c in g)
    assert len(replay_pcm) == narrated > 0


def test_duplex_respond(tiny_tts, monkeypatch):
    from sesameai_tts_tpu.apps.duplex import DuplexVoiceApp

    from sesameai_tts_tpu.runtime.frames import Segment

    gen = tiny_tts.generator
    hop0 = gen._mimi.cfg.hop_length
    short_voice = Segment(
        speaker=1, text="v",
        audio=(np.random.default_rng(3).normal(size=2 * hop0) * 0.1).astype(np.float32),
    )
    app = DuplexVoiceApp(
        gen,
        stt=lambda audio, rate: "hello bot",
        llm=FakeLLM("Hi human. All good?"),
        voice_context=[short_voice],  # tiny flavor: 256 positions total
        temperature=0.8,
        topk=5,
        max_sentence_ms=480,
    )
    hop = gen._mimi.cfg.hop_length
    user_audio = (np.random.default_rng(1).normal(size=2 * hop) * 0.1).astype(np.float32)
    chunks = list(app.respond(user_audio, 24_000))
    # may be empty if EOS hits immediately, but protocol must hold
    for sr, pcm in chunks:
        assert sr == 24_000
        assert pcm.dtype == np.float32
    # context recycled: user turn + up to 2 assistant sentences
    assert app.context.window_rows > 0
    app.clear_dialog()
    assert app.context.window_rows == 0


def test_storyteller_new_vs_continue_and_reset(tiny_tts, monkeypatch):
    """is_continuation=False restarts the story (reference's New Story
    button semantics, web_storyteller.py:556-609); clear_session_for_ui
    returns the full cleared-UI tuple."""
    from sesameai_tts_tpu.apps.web_storyteller import StorytellerApp

    monkeypatch.setattr(
        "sesameai_tts_tpu.apps.web_base.AskLLM",
        lambda **kw: FakeLLM("A fox ran. It hid."),
    )
    app = StorytellerApp(voice="v", model="local-default", tts=tiny_tts)
    outs = list(app.continue_story("go", use_llm=True))
    _, _, s, e, active, _ = outs[-1]
    list(app.sentence_generator_loop(s, e, True, temperature=0.8, topk=5))
    assert len(app.story_parts) == 1
    assert len(app.generated_prompt_wav_paths) == 1

    # continuation appends
    list(app.continue_story("more", use_llm=True, is_continuation=True))
    assert len(app.story_parts) == 2

    # a NEW story discards everything narrated so far
    outs3 = list(app.continue_story("fresh", use_llm=True,
                                    is_continuation=False))
    assert len(app.story_parts) == 1
    assert app.generated_prompt_wav_paths == []
    assert outs3[-1][5] is None  # nothing to replay after reset

    cleared = app.clear_session_for_ui()
    assert len(cleared) == 9
    assert cleared[2] == (0, 0) and cleared[3] is False
    assert app.story_parts == [] and app.prompt_audio_segments == []


def test_chat_app_clear_session_and_system_prompt(tiny_tts, monkeypatch):
    """clear_session resets chat+LLM state and returns UI values;
    update_system_prompt swaps the prompt and rebuilds the client
    (reference web_chat.py:177-209)."""
    from sesameai_tts_tpu.apps.web_chat import ChatApp
    from sesameai_tts_tpu.llm.client import global_config as llm_config

    monkeypatch.setattr(
        "sesameai_tts_tpu.apps.web_base.AskLLM", lambda **kw: FakeLLM()
    )
    app = ChatApp(voice="v", model="local-default", tts=tiny_tts)
    list(app.process_query("hi", temperature=0.9))
    assert app.messages

    cleared = app.clear_session()
    assert app.messages == []
    assert cleared[0] == [] and cleared[4] is False
    assert "Session cleared" in cleared[1]

    status = app.update_system_prompt("You are a pirate narrator.")
    assert "updated" in status
    assert llm_config.SYSTEM_MESSAGE == "You are a pirate narrator."
