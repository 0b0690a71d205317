"""In-memory gradio double for exercising the apps' ``main()`` Blocks
wiring without the real dependency (VERDICT r3 #6).

gradio is not installable in this environment, so the UI builder code
paths (``web_chat.main`` / ``web_storyteller.main``) would otherwise
never execute — a regression in the Blocks wiring would ship silently.
This shim records the component tree and event chains AND can *fire*
them: ``Event.fire()`` runs every step of a ``.click(...).then(...)``
chain against the real app logic, gathering inputs from component
values, exhausting generator handlers, and validating that each step's
output arity matches its declared output list (the exact class of bug
— reference web_chat.py:337-377's event chain — most likely to rot).

Usage (see tests/test_apps_ui.py):

    import fake_gradio
    sys.modules["gradio"] = fake_gradio
    web_chat.main(["--flavor", "test-tiny"])   # builds real Blocks
    demo = fake_gradio.Blocks.last
    demo.event_for(send_button, "click").fire()
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

__version__ = "0.fake"


class _Update(dict):
    """gr.update(...) sentinel: 'leave the component as-is / patch props'."""


def update(**kwargs) -> _Update:
    return _Update(kwargs)


class Event:
    """One trigger plus its .then() chain; fire() executes it."""

    def __init__(self, source: "Component", trigger: str):
        self.source = source
        self.trigger = trigger
        self.steps: List[tuple] = []  # (fn, inputs, outputs)

    def _add(self, fn, inputs, outputs) -> "Event":
        self.steps.append((fn, list(inputs or []), list(outputs or [])))
        return self

    def then(self, fn=None, inputs=None, outputs=None, **_kw) -> "Event":
        return self._add(fn, inputs, outputs)

    def fire(self) -> List[Any]:
        """Execute the chain like the gradio runtime would.

        Inputs are read from ``Component.value``; generator handlers are
        exhausted with EVERY yield arity-checked and applied (streaming
        semantics); outputs are written back to ``Component.value``
        unless the handler yielded ``gr.update()`` for that slot.
        Returns the final value list of the last step.
        """
        last: List[Any] = []
        for fn, inputs, outputs in self.steps:
            args = [c.value for c in inputs]
            result = fn(*args)
            if hasattr(result, "__next__"):  # generator handler: every
                for item in result:          # yield updates, like gradio
                    self._check_arity(fn, item, outputs)
                    last = self._assign(item, outputs)
            else:
                self._check_arity(fn, result, outputs)
                last = self._assign(result, outputs)
        return last

    @staticmethod
    def _check_arity(fn, result, outputs) -> None:
        if len(outputs) <= 1:
            return
        if not isinstance(result, (tuple, list)) or len(result) != len(outputs):
            got = (len(result) if isinstance(result, (tuple, list))
                   else f"scalar {type(result).__name__}")
            raise AssertionError(
                f"handler {getattr(fn, '__name__', fn)!r} returned {got} "
                f"values for {len(outputs)} declared outputs"
            )

    @staticmethod
    def _assign(result, outputs) -> List[Any]:
        if not outputs:
            return []
        values = [result] if len(outputs) == 1 else list(result)
        for comp, val in zip(outputs, values):
            if not isinstance(val, _Update):
                comp.value = val
        return values


class Component:
    """Base for every gr.* widget: records itself and its props."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        self.value = kwargs.get("value")
        if args and self.value is None and not isinstance(self, Slider):
            # gr.Button("text") / gr.Markdown("text") positional value
            self.value = args[0]
        self.choices = kwargs.get("choices")
        blocks = Blocks.current
        if blocks is not None:
            blocks.components.append(self)
        self._blocks = blocks

    def _event(self, trigger: str, fn, inputs, outputs) -> Event:
        ev = Event(self, trigger)._add(fn, inputs, outputs)
        if self._blocks is not None:
            self._blocks.events.append(ev)
        return ev

    def click(self, fn=None, inputs=None, outputs=None, **_kw) -> Event:
        return self._event("click", fn, inputs, outputs)

    def submit(self, fn=None, inputs=None, outputs=None, **_kw) -> Event:
        return self._event("submit", fn, inputs, outputs)

    def change(self, fn=None, inputs=None, outputs=None, **_kw) -> Event:
        return self._event("change", fn, inputs, outputs)


class _Container(Component):
    """Layout node (Row/Column/Accordion/Tabs/TabItem): a no-op ctx mgr."""

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Row(_Container):
    pass


class Column(_Container):
    pass


class Accordion(_Container):
    pass


class Tabs(_Container):
    pass


class TabItem(_Container):
    pass


class Markdown(Component):
    pass


class Textbox(Component):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.value is None:
            self.value = ""


class Button(Component):
    pass


class Dropdown(Component):
    pass


class Radio(Component):
    pass


class Slider(Component):
    def __init__(self, minimum=0, maximum=1, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.minimum, self.maximum = minimum, maximum
        self.step = kwargs.get("step")


class Audio(Component):
    pass


class Chatbot(Component):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if self.value is None:
            self.value = []


class File(Component):
    pass


class State(Component):
    def __init__(self, value=None):
        super().__init__(value=value)


class Blocks(_Container):
    """Records the component tree, event chains, and launch() config."""

    current: Optional["Blocks"] = None
    last: Optional["Blocks"] = None

    def __init__(self, *args, title=None, theme=None, **kwargs):
        self.components: List[Component] = []
        self.events: List[Event] = []
        self.title = title
        self.queue_kwargs = None
        self.launch_kwargs = None
        super().__init__(*args, **kwargs)

    def __enter__(self):
        Blocks.current = self
        Blocks.last = self
        return self

    def __exit__(self, *exc):
        Blocks.current = None
        return False

    def queue(self, **kwargs) -> "Blocks":
        self.queue_kwargs = kwargs
        return self

    def launch(self, **kwargs) -> "Blocks":
        self.launch_kwargs = kwargs  # record; never bind a port
        return self

    # -- test conveniences ------------------------------------------------
    def by_label(self, label: str) -> Component:
        for c in self.components:
            if c.label == label:
                return c
        raise KeyError(label)

    def events_for(self, comp: Component, trigger: Optional[str] = None):
        return [e for e in self.events
                if e.source is comp and (trigger is None or e.trigger == trigger)]

    def event_for(self, comp: Component, trigger: str) -> Event:
        (ev,) = self.events_for(comp, trigger)
        return ev


class _Themes:
    @staticmethod
    def Soft(*a, **kw):
        return "soft-theme"

    @staticmethod
    def Default(*a, **kw):
        return "default-theme"


themes = _Themes()
