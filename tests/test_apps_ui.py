"""UI builder coverage: the apps' ``main()`` Blocks wiring executes
under the fake-gradio shim (VERDICT r3 #6).

The logic classes are covered in test_apps.py; what was missing is the
``main()`` body itself — argument parsing, Blocks layout, and the event
chains (reference web_chat.py:337-377, web_storyteller.py:384-666).
These tests run ``main()`` against tests/fake_gradio.py, then FIRE the
recorded event chains against the real app logic (tiny generator, fake
LLM): a component renamed out of an input list, an output-arity
mismatch, or a dropped ``.then`` link fails here instead of shipping
silently.
"""

import sys
import types

import numpy as np
import pytest

import fake_gradio
from test_apps import FakeLLM


@pytest.fixture()
def voices_root(tmp_path):
    from sesameai_tts_tpu.audio.io import write_wav

    vdir = tmp_path / "v"
    vdir.mkdir()
    wav = (np.random.default_rng(0).normal(size=2400) * 0.1).astype(np.float32)
    write_wav(str(vdir / "c.wav"), wav, 24_000)
    (vdir / "c.txt").write_text("clip")
    return str(tmp_path)


@pytest.fixture()
def ui_env(monkeypatch, voices_root):
    monkeypatch.setitem(sys.modules, "gradio", fake_gradio)
    monkeypatch.setattr(
        "sesameai_tts_tpu.apps.web_base.AskLLM", lambda **kw: FakeLLM()
    )
    fake_gradio.Blocks.last = None
    return voices_root


def test_web_chat_main_wiring(ui_env):
    from sesameai_tts_tpu.apps import web_chat

    web_chat.main(["--flavor", "test-tiny", "-v", "v", "--voices", ui_env])
    demo = fake_gradio.Blocks.last
    assert demo is not None and demo.title == "Sesame Chat (TPU)"
    assert demo.queue_kwargs == {"max_size": 20}
    assert demo.launch_kwargs["server_port"] == 7860

    chatbot = next(c for c in demo.components
                   if isinstance(c, fake_gradio.Chatbot))
    query = next(c for c in demo.components
                 if isinstance(c, fake_gradio.Textbox)
                 and c.kwargs.get("autofocus"))
    audio_out = demo.by_label("TTS Narration")
    send = next(c for c in demo.components if c.value == "Send")
    clear = next(c for c in demo.components
                 if c.value == "Clear Conversation")

    # send.click: interrupt → submit → clear-input → audio pump
    ev = demo.event_for(send, "click")
    assert len(ev.steps) == 4
    # Enter in the query box drives the identical chain
    assert len(demo.event_for(query, "submit").steps) == 4

    query.value = "hello there"
    ev.fire()
    assert query.value == ""                       # cleared by the chain
    assert chatbot.value[-1]["role"] == "assistant"
    assert "sentence" in chatbot.value[-1]["content"].lower()
    sr, pcm = audio_out.value                      # pump reached the player
    assert sr == 24_000 and pcm.dtype == np.float32 and len(pcm) > 0

    # clear wipes transcript + player
    demo.event_for(clear, "click").fire()
    assert chatbot.value == [] and audio_out.value is None

    # voice/model dropdowns and the prompt editor report through Status
    status = demo.by_label("Status")
    voice_dd = demo.by_label("Select Voice")
    demo.event_for(voice_dd, "change").fire()
    assert "v" in str(status.value)
    editor = demo.by_label("Edit System Prompt")
    editor.value = "You are a pirate narrator."
    update_btn = next(c for c in demo.components
                      if c.value == "Update System Prompt")
    demo.event_for(update_btn, "click").fire()
    assert "updated" in str(status.value).lower()


def test_web_storyteller_main_wiring(ui_env, monkeypatch):
    from sesameai_tts_tpu.apps import web_storyteller

    web_storyteller.main(["--flavor", "test-tiny", "-v", "v",
                          "--voices", ui_env])
    demo = fake_gradio.Blocks.last
    assert demo is not None and demo.title == "Storyteller TTS (TPU)"
    assert demo.launch_kwargs["server_port"] == 7861

    story = demo.by_label("Story so far")
    prompt = demo.by_label("LLM Prompt")
    pasted = demo.by_label("Paste Text Here")
    audio_out = demo.by_label("Narration Stream")
    seg_files = demo.by_label("Segment Audio Files (WAV)")
    status = demo.by_label("Status")
    buttons = {c.value: c for c in demo.components
               if isinstance(c, fake_gradio.Button)}

    # five drive triggers, each a drive(+clear)→pump chain
    for name, steps in [("✨ Start New Story", 3), ("➡️ Continue Story", 3),
                        ("✨ Start New Text", 2), ("➡️ Append Text", 2)]:
        assert len(demo.event_for(buttons[name], "click").steps) == steps
    assert len(demo.event_for(prompt, "submit").steps) == 3

    prompt.value = "begin the story"
    demo.event_for(buttons["✨ Start New Story"], "click").fire()
    assert prompt.value == ""                      # chain clears the input
    assert "sentence" in str(story.value).lower()  # FakeLLM's story text
    assert [p.endswith("prompt_01.wav") for p in seg_files.value] == [True]
    sr, pcm = audio_out.value
    assert sr == 24_000 and len(pcm) > 0

    # pasted-text tab drives the same pump without the LLM
    pasted.value = "Direct text here."
    demo.event_for(buttons["✨ Start New Text"], "click").fire()
    assert pasted.value == "Direct text here."     # kept (clear_input=False)
    assert "direct text" in str(story.value).lower()
    assert seg_files.value and seg_files.value[-1].endswith(".wav")

    # full-story combine produces a downloadable WAV
    demo.event_for(buttons["💾 Generate & Download Full Story (WAV)"],
                   "click").fire()
    story_file = demo.by_label("Full Story Download(s)")
    assert story_file.value and story_file.value[0].endswith(".wav")
    assert "saved" in str(status.value).lower()

    # reset clears the whole session surface
    demo.event_for(buttons["Reset Session"], "click").fire()
    assert story.value == "" and seg_files.value == []


def test_duplex_main_wiring(monkeypatch):
    from sesameai_tts_tpu.apps import duplex

    recorded = {}

    class ReplyOnPause:
        def __init__(self, fn, can_interrupt=False):
            recorded["fn"], recorded["can_interrupt"] = fn, can_interrupt

    class Stream:
        def __init__(self, handler):
            recorded["handler"] = handler
            self.ui = self

        def launch(self, **kw):
            recorded["launched"] = kw

    fake_rtc = types.ModuleType("fastrtc")
    fake_rtc.ReplyOnPause, fake_rtc.Stream = ReplyOnPause, Stream
    monkeypatch.setitem(sys.modules, "fastrtc", fake_rtc)
    monkeypatch.setattr(
        "sesameai_tts_tpu.apps.duplex.AskLLM", lambda *a, **kw: FakeLLM()
    )

    duplex.main(["--flavor", "test-tiny"])
    assert recorded["can_interrupt"] is True and "launched" in recorded
    # the wired handler is the documented stub: it demands a real STT
    gen = recorded["fn"]((24_000, np.zeros(2400, np.float32)))
    with pytest.raises(SystemExit, match="STT"):
        list(gen)
