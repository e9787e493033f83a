"""Round-trip the zero-dep tfevents writer against tensorboard's own reader
(the format consumer an external dashboard would use)."""
import math

import pytest

from splat_tpu.utils.tbevents import TBEventWriter, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors (Castagnoli)
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_event_file_roundtrip(tmp_path):
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")

    with TBEventWriter(tmp_path) as w:
        w.add_scalar("train/loss", 0.5, step=10)
        w.add_scalars([("train/loss", 0.25), ("eval/psnr", 21.5)], step=20)

    loader = tb.EventFileLoader(str(w.path))
    events = list(loader.Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = []
    for ev in events[1:]:
        for v in ev.summary.value:
            # the loader migrates legacy simple_value into a rank-0 tensor
            x = (v.tensor.float_val[0] if v.tensor.float_val
                 else v.simple_value)
            scalars.append((ev.step, v.tag, x))
    assert (10, "train/loss", 0.5) in [
        (s, t, round(x, 6)) for s, t, x in scalars
    ]
    got = {(s, t): x for s, t, x in scalars}
    assert math.isclose(got[(20, "train/loss")], 0.25, rel_tol=1e-6)
    assert math.isclose(got[(20, "eval/psnr")], 21.5, rel_tol=1e-6)
