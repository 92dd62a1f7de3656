"""Minimal gradio stand-in: just enough API surface for
blobctrl_tpu.apps.gradio_app.build_demo to construct and for tests to invoke
every registered event handler once (gradio itself is not installed in CI).

Usage (see test_gradio_wiring.py):
    stub = install()                 # sys.modules["gradio"] = stub
    demo = build_demo(session, ...)  # records widgets + events on demo
    demo.events                      # [Event(component, name, fn, ins, outs)]
"""

from __future__ import annotations

import sys
import types
from typing import Any, List, Optional


class Event:
    def __init__(self, component, name: str, fn, inputs, outputs):
        self.component = component
        self.name = name
        self.fn = fn
        self.inputs = list(inputs) if inputs else []
        if outputs is None:
            self.outputs = []
        elif isinstance(outputs, (list, tuple)):
            self.outputs = list(outputs)
        else:
            self.outputs = [outputs]


class Component:
    """Base widget: stores label/value, registers events on the active
    Blocks."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.label = kwargs.get("label")
        self.value = kwargs.get("value")
        blocks = _STATE.get("blocks")
        if blocks is not None:
            blocks.components.append(self)

    def _register(self, name, fn, inputs=None, outputs=None):
        blocks = _STATE.get("blocks")
        assert blocks is not None, f".{name}() outside a Blocks context"
        ev = Event(self, name, fn, inputs, outputs)
        blocks.events.append(ev)
        return ev

    def click(self, fn, inputs=None, outputs=None, **kw):
        return self._register("click", fn, inputs, outputs)

    def upload(self, fn, inputs=None, outputs=None, **kw):
        return self._register("upload", fn, inputs, outputs)

    def select(self, fn, inputs=None, outputs=None, **kw):
        return self._register("select", fn, inputs, outputs)

    def release(self, fn, inputs=None, outputs=None, **kw):
        return self._register("release", fn, inputs, outputs)

    def change(self, fn, inputs=None, outputs=None, **kw):
        return self._register("change", fn, inputs, outputs)


class Image(Component):
    pass


class Gallery(Component):
    pass


class Textbox(Component):
    pass


class Checkbox(Component):
    pass


class Markdown(Component):
    def __init__(self, text: str = "", **kwargs):
        super().__init__(text, **kwargs)


class Button(Component):
    def __init__(self, text: str = "", **kwargs):
        super().__init__(text, **kwargs)
        self.label = kwargs.get("label", text)


class Slider(Component):
    def __init__(self, minimum=0, maximum=1, value=None, **kwargs):
        super().__init__(**kwargs)
        self.minimum, self.maximum = minimum, maximum
        self.value = value if value is not None else minimum


class Dropdown(Component):
    def __init__(self, choices=None, **kwargs):
        super().__init__(**kwargs)
        self.choices = list(choices or [])
        self.value = kwargs.get("value")


class _Container:
    """Row/Column/Accordion: pure layout, no behavior."""

    def __init__(self, *args, **kwargs):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


Row = Column = Accordion = _Container


class Blocks:
    def __init__(self, *args, **kwargs):
        self.title = kwargs.get("title")
        self.components: List[Component] = []
        self.events: List[Event] = []

    def __enter__(self):
        _STATE["blocks"] = self
        return self

    def __exit__(self, *exc):
        _STATE["blocks"] = None
        return False

    def launch(self, *args, **kwargs):
        raise RuntimeError("stub gradio cannot launch a real server")

    # --- test helpers -----------------------------------------------------

    def find_event(self, name: str, label_part: str) -> Event:
        """Unique event of kind `name` whose component label contains
        label_part."""
        hits = [e for e in self.events
                if e.name == name and e.component.label
                and label_part in e.component.label]
        assert len(hits) == 1, (
            f"expected exactly one {name!r} event with label containing "
            f"{label_part!r}, found {len(hits)}: "
            f"{[e.component.label for e in hits]}")
        return hits[0]


class SelectData:
    """gradio injects this for .select handlers; only .index is used."""

    def __init__(self, index=(0, 0)):
        self.index = tuple(index)


WARNINGS: List[str] = []


def Warning(msg: str):  # noqa: N802 — gradio's own casing
    WARNINGS.append(str(msg))


class _Update(dict):
    pass


def update(**kwargs):
    return _Update(kwargs)


_STATE = {"blocks": None}


def install() -> types.ModuleType:
    """Install this stub as sys.modules['gradio'] and return it. Callers
    must not install over a real gradio."""
    mod = types.ModuleType("gradio")
    for name in ("Blocks", "Row", "Column", "Accordion", "Markdown", "Image",
                 "Gallery", "Textbox", "Checkbox", "Button", "Slider",
                 "Dropdown", "SelectData", "Warning", "update", "Event"):
        setattr(mod, name, globals()[name])
    mod.WARNINGS = WARNINGS
    sys.modules["gradio"] = mod
    return mod


def uninstall():
    sys.modules.pop("gradio", None)
