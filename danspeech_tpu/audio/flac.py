"""FLAC decoding (replaces the reference's bundled GPL flac binaries,
/root/reference/danspeech/audio/flac-* + resources.py:97-139).

The decode is host-side only (never touches the TPU). Backed by the native
C++ decoder in ``native/flacdec`` when built; a pure-Python fallback will
refuse gracefully until then.
"""

from __future__ import annotations


def decode_flac(data: bytes):
    """Decode FLAC bytes -> (nchannels, sampwidth, framerate, pcm_le_bytes).

    Raises ValueError if ``data`` is not a FLAC stream.
    """
    if len(data) < 4 or data[:4] != b"fLaC":
        raise ValueError("Not a FLAC file")
    from ._flac_py import decode_flac_py

    return decode_flac_py(data)
