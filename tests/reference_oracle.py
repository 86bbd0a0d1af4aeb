"""Test-only harness for loading the PyTorch reference at /root/reference as a
numerical oracle (SURVEY.md §7 "parity validation"). Nothing from the
reference is vendored into this repo; it is imported at test runtime only and
every test using it is skipped when the tree is absent.

pretty_midi is not installed in this image; the reference imports it at module
scope, so a minimal stub is placed in sys.modules first (the oracle tests only
exercise tensor math, never MIDI I/O).
"""
import os
import sys
import types

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def load_reference():
    """Import the reference modules; returns a namespace or None."""
    if not reference_available():
        return None
    if "pretty_midi" not in sys.modules:
        pm = types.ModuleType("pretty_midi")

        class _Note:
            def __init__(self, velocity, pitch, start, end):
                self.velocity, self.pitch = velocity, pitch
                self.start, self.end = start, end

        class _Instrument:
            def __init__(self, program, name=""):
                self.program, self.name, self.notes = program, name, []

        class _PrettyMIDI:
            def __init__(self, *a, **k):
                self.instruments = []

            def write(self, fn):
                raise NotImplementedError

        pm.Note, pm.Instrument, pm.PrettyMIDI = _Note, _Instrument, _PrettyMIDI
        sys.modules["pretty_midi"] = pm
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    ns = types.SimpleNamespace()
    import converter as ref_converter        # noqa: E402
    import dataset as ref_dataset            # noqa: E402
    import ptvae as ref_ptvae                # noqa: E402
    import model as ref_model                # noqa: E402
    ns.converter = ref_converter
    ns.dataset = ref_dataset
    ns.ptvae = ref_ptvae
    ns.model = ref_model
    return ns
