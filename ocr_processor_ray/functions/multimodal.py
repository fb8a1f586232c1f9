"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video are ``binary`` columns with sidecar metadata.
The Ray-side plumbing (schema, actor signature, small batches, output
layout) is real and tested; the actual codec work is STUBBED because the
media libraries are not in this container:

* ``DecodeImage(fake=True)`` produces deterministic fake features
  derived from the payload bytes (so pipelines are testable end-to-end);
* ``DecodeImage(fake=None)`` auto-detects: PIL when importable (loaded
  once per actor in ``__init__`` — the reference's engine-binary seam,
  ocr_combined.py:193-199), else the stub;
* ``DecodeImage(fake=False)`` requires the real codec and raises
  ``NotImplementedError`` at ``__init__`` when it is absent.

Batch sizing: media payloads are MBs per row, so stages default to
``batch_size=16`` — batch × concurrency must fit worker heaps
(SURVEY.md §4.2 memory row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)

DEFAULT_MEDIA_BATCH_SIZE = 16


def _try_pil():
    """The optional-codec seam (the analog of the reference's external
    engine binary, ocr_combined.py:193-199): PIL when importable, else
    ``None`` — callers fall back to the deterministic stub."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


class DecodeImage:
    """Actor-pool decode stage (callable class = state loaded once).

    ``fake`` modes:

    * ``None`` (auto) — use PIL if importable (loaded once per actor,
      here in ``__init__``), else the deterministic stub;
    * ``True``  — always the stub (bytes-derived fake features);
    * ``False`` — require the real codec; raises in ``__init__`` when
      PIL is absent.

    Both paths emit the SAME schema: (dec_width, dec_height, mean_luma,
    phash). Real-path rows whose bytes fail to decode get the sentinel
    ``dec_width = dec_height = -1`` (never raises mid-batch — the O8
    never-drop contract applies to media too).
    """

    def __init__(self, fake: bool | None = True, payload_col: str = "payload"):
        self._pil = None
        if fake is None:
            self._pil = _try_pil()
        elif not fake:
            self._pil = _try_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips, not present in this "
                    "environment; construct with fake=True for the deterministic "
                    "stub or fake=None to auto-fall-back"
                )
        self.payload_col = payload_col

    @staticmethod
    def _fake_features(data: bytes) -> tuple[int, int, float, int]:
        digest = hashlib.blake2b(data, digest_size=24).digest()
        width = 64 + digest[0] % 192
        height = 64 + digest[1] % 192
        mean_luma = round(digest[2] / 255.0, 6)
        phash = int.from_bytes(digest[8:16], "big") - (1 << 63)
        return width, height, mean_luma, phash

    def _real_features(self, data: bytes) -> tuple[int, int, float, int]:
        import io

        try:
            img = self._pil.open(io.BytesIO(data))
            width, height = img.size
            gray = np.asarray(img.convert("L"), dtype=np.float64)
            mean_luma = round(float(gray.mean()) / 255.0, 6) if gray.size else 0.0
            small = np.asarray(img.convert("L").resize((8, 8)), dtype=np.float64)
            bits = (small >= small.mean()).flatten()
            phash = int(np.packbits(bits).view(">u8")[0]) - (1 << 63)
            return width, height, mean_luma, phash
        except Exception:
            return -1, -1, 0.0, 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        features = self._real_features if self._pil is not None else self._fake_features
        w, h, luma, ph = [], [], [], []
        for data in payloads:
            fw, fh, fl, fp = features(data or b"")
            w.append(fw)
            h.append(fh)
            luma.append(fl)
            ph.append(fp)
        return (
            batch.drop_columns([self.payload_col])  # decoded: drop heavy bytes
            .append_column("dec_width", pa.array(w, pa.int32()))
            .append_column("dec_height", pa.array(h, pa.int32()))
            .append_column("mean_luma", pa.array(luma, pa.float64()))
            .append_column("phash", pa.array(ph, pa.int64()))
        )


def decode_images(ds: Dataset, concurrency=(1, 4), batch_size: int = DEFAULT_MEDIA_BATCH_SIZE) -> Dataset:
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"fake": True},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus for tests (binary payloads)."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(256 + int(rng.randint(0, 1024))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["image/fake"] * n, pa.string()),
            "width": pa.array([0] * n, pa.int32()),
            "height": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def synth_wav_table(n: int = 32, seed: int = 13) -> pa.Table:
    """Deterministic REAL-WAV corpus: PCM payloads written with stdlib
    ``wave`` (varied rate / channel count / non-integral duration so the
    chunker's floor arithmetic is exercised), plus the generator's
    ground-truth columns (framerate, nframes, nchannels, sampwidth) an
    oracle can derive expected chunk boundaries from. Every 8th row is
    a corrupt non-WAV payload (framerate recorded 0) — the real chunk
    path must skip it with zero rows (O8 semantics)."""
    import io
    import wave as _wave

    rng = np.random.RandomState(seed)
    rates = [8000, 11025, 16000]
    ids, pays, frs, nfs, nchs, sws = [], [], [], [], [], []
    for i in range(n):
        ids.append(i)
        if i % 8 == 7:
            pays.append(rng.bytes(64 + int(rng.randint(0, 256))))
            frs.append(0)
            nfs.append(0)
            nchs.append(0)
            sws.append(0)
            continue
        fr = rates[int(rng.randint(0, len(rates)))]
        nch = int(rng.randint(1, 3))
        sw = 2
        dur_s = float(rng.uniform(2.0, 40.0))
        nframes = int(dur_s * fr)
        pcm = rng.bytes(nframes * nch * sw)
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sw)
            w.setframerate(fr)
            w.writeframes(pcm)
        pays.append(buf.getvalue())
        frs.append(fr)
        nfs.append(nframes)
        nchs.append(nch)
        sws.append(sw)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(pays, pa.binary()),
            "framerate": pa.array(frs, pa.int64()),
            "nframes": pa.array(nfs, pa.int64()),
            "nchannels": pa.array(nchs, pa.int64()),
            "sampwidth": pa.array(sws, pa.int64()),
        }
    )


class ResizeImage:
    """Actor-pool resize stage (real path would hold libvips from
    ``__init__``; fake path derives the resized payload + dims
    deterministically from the source bytes and target box)."""

    def __init__(self, target: tuple[int, int] = (224, 224), fake: bool | None = True,
                 payload_col: str = "payload"):
        self._pil = None
        if fake is None:
            self._pil = _try_pil()
        elif not fake:
            self._pil = _try_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real resize requires PIL/libvips, not present in this "
                    "environment; construct with fake=True for the deterministic "
                    "stub or fake=None to auto-fall-back"
                )
        self.target = target
        self.payload_col = payload_col

    def _real_resize(self, data: bytes) -> bytes:
        import io

        try:
            img = self._pil.open(io.BytesIO(data))
            buf = io.BytesIO()
            img.resize(self.target).save(buf, format="PNG")
            return buf.getvalue()
        except Exception:
            return b""  # undecodable payload → empty sentinel, never raises

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        out = []
        for data in batch[self.payload_col].to_pylist():
            if self._pil is not None:
                out.append(self._real_resize(data or b""))
                continue
            out.append(
                hashlib.blake2b(
                    (data or b"") + f"{tw}x{th}".encode(), digest_size=64
                ).digest()
            )
        return (
            batch.drop_columns([self.payload_col])
            .append_column("rs_width", pa.array([tw] * batch.num_rows, pa.int32()))
            .append_column("rs_height", pa.array([th] * batch.num_rows, pa.int32()))
            .append_column("payload", pa.array(out, pa.binary()))
        )


def resize_images(ds: Dataset, target=(224, 224), concurrency=(1, 4),
                  batch_size: int = DEFAULT_MEDIA_BATCH_SIZE) -> Dataset:
    return ds.map_batches(
        ResizeImage,
        fn_constructor_kwargs={"target": target, "fake": True},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _try_av():
    """Optional video-codec seam (same pattern as ``_try_pil``): PyAV
    when importable, else ``None`` — callers fall back to the stub."""
    try:
        import av

        return av
    except ImportError:
        return None


class FrameSample:
    """Video → N evenly-spaced frames, exploded to one row per frame
    (the flat-map shape: a 2-hour video becomes N bounded rows, never one
    giant decoded array).

    ``fake`` modes mirror ``DecodeImage``: ``None`` auto-detects PyAV
    (held per actor from ``__init__`` — the external-engine seam,
    ocr_combined.py:193-199), ``True`` forces the deterministic stub,
    ``False`` requires the real codec and raises at ``__init__`` when
    PyAV is absent. The real path decodes each payload once and keeps
    the N frames nearest the evenly-spaced timestamps; a payload PyAV
    cannot parse yields zero rows (corrupt-input-skip, O8 semantics)."""

    def __init__(self, n_frames: int = 4, fake: bool | None = True,
                 payload_col: str = "payload"):
        if fake is None:
            self._av = _try_av()
        elif not fake:
            self._av = _try_av()
            if self._av is None:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/pyav, not present in "
                    "this environment; construct with fake=True for the "
                    "deterministic stub or fake=None to auto-fall-back"
                )
        else:
            self._av = None
        self.n_frames = n_frames
        self.payload_col = payload_col

    def _real_frames(self, data: bytes) -> list[tuple[int, int, bytes]]:
        """(frame_idx, ts_ms, jpeg_bytes) — N evenly spaced timestamps.

        Seek-based: for each target timestamp, seek to the nearest
        keyframe and decode forward only until the first frame at/past
        the target — at most a GOP of frames is ever alive per pick, so
        a 2-hour video costs N seeks + N short decode bursts, never a
        full-corpus decode (the earlier ``list(container.decode(...))``
        materialized EVERY frame before picking — hundreds of GB of raw
        pixels for long inputs, with the resulting MemoryError swallowed
        as 'zero frames')."""
        import io

        def forward_decode(container, stream) -> list[tuple[int, int, bytes]]:
            """Decode from the start, keep the first n frames — the path
            for unknown duration AND pts-less streams (frame order is
            the only usable axis when timestamps are absent)."""
            out = []
            for fr in container.decode(stream):
                ts_ms = int((fr.time or 0.0) * 1000)
                buf = io.BytesIO()
                fr.to_image().save(buf, format="JPEG")
                out.append((len(out), ts_ms, buf.getvalue()))
                if len(out) >= self.n_frames:
                    break
            return out

        try:
            with self._av.open(io.BytesIO(data)) as container:
                stream = container.streams.video[0]
                dur_s = (
                    float(container.duration) / 1_000_000.0
                    if container.duration
                    else 0.0
                )
                if dur_s <= 0:
                    return forward_decode(container, stream)
                out = []
                for i in range(self.n_frames):
                    target_s = dur_s * i / self.n_frames
                    container.seek(
                        int(target_s * 1_000_000), any_frame=False
                    )
                    hit = last = None
                    for fr in container.decode(stream):
                        last = fr
                        if fr.time is None:
                            # pts-less frames satisfy every target at the
                            # first decode — seek targets are meaningless;
                            # restart with the forward-decode path instead
                            container.seek(0)
                            return forward_decode(container, stream)
                        if fr.time >= target_s:
                            hit = fr
                            break
                    # container duration can overstate the last video
                    # frame's timestamp (truncated payload, audio
                    # outlasting video): fall back to the burst's last
                    # decoded frame, then STOP — every later target is
                    # larger and would re-decode the same tail for the
                    # same miss
                    fr = hit or last
                    if fr is not None:
                        ts_ms = int((fr.time or 0.0) * 1000)
                        buf = io.BytesIO()
                        fr.to_image().save(buf, format="JPEG")
                        out.append((i, ts_ms, buf.getvalue()))
                    if hit is None:
                        break
                return out
        except Exception:
            return []  # unparsable payload → zero frames, never raises

    def _fake_frames(self, data: bytes) -> list[tuple[int, int, bytes]]:
        dur_ms = 1000 + (len(data) * 37) % 600000  # fake duration
        return [
            (
                i,
                int(i * dur_ms / self.n_frames),
                hashlib.blake2b(data + bytes([i]), digest_size=32).digest(),
            )
            for i in range(self.n_frames)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_of = self._real_frames if self._av is not None else self._fake_frames
        ids, fidx, fts, fpay = [], [], [], []
        for mid, data in zip(
            batch["media_id"].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            for i, ts, payload in frames_of(data or b""):
                ids.append(mid)
                fidx.append(i)
                fts.append(ts)
                fpay.append(payload)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "ts_ms": pa.array(fts, pa.int64()),
                "frame": pa.array(fpay, pa.binary()),
            }
        )


def sample_frames(ds: Dataset, n_frames: int = 4, concurrency=(1, 4),
                  batch_size: int = DEFAULT_MEDIA_BATCH_SIZE) -> Dataset:
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": True},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AudioChunk:
    """Audio → fixed-length windows with overlap, exploded one row per
    chunk (the streaming-ASR pre-processing shape: an hour of audio
    becomes bounded rows; batch inference consumes chunks, not files).

    ``fake`` modes mirror ``DecodeImage``; the REAL path needs no
    external dependency — stdlib ``wave`` parses WAV containers, so
    ``fake=False`` always works for PCM WAV payloads: the true duration
    comes from the header and each chunk's payload is the actual PCM
    byte slice for its window (a WAV payload the parser rejects yields
    zero chunks — corrupt-input-skip, O8 semantics). ``fake=True``
    keeps the deterministic stub (hash-derived durations/payloads) for
    synthetic corpora; ``fake=None`` tries WAV per payload and falls
    back to the stub for non-WAV bytes."""

    def __init__(self, chunk_ms: int = 30_000, overlap_ms: int = 1_000,
                 fake: bool | None = True, payload_col: str = "payload"):
        if overlap_ms >= chunk_ms:
            raise ValueError("overlap must be shorter than the chunk")
        self.fake = fake
        self.chunk_ms = chunk_ms
        self.overlap_ms = overlap_ms
        self.payload_col = payload_col

    def _parse_wav(self, data: bytes):
        """(duration_ms, pcm_bytes, bytes_per_ms) or None if not WAV."""
        import io
        import wave

        try:
            with wave.open(io.BytesIO(data)) as w:
                nch, sw, fr, nframes = (
                    w.getnchannels(),
                    w.getsampwidth(),
                    w.getframerate(),
                    w.getnframes(),
                )
                pcm = w.readframes(nframes)
        except Exception:
            return None
        if fr <= 0:
            return None
        frame_bytes = nch * sw
        dur_ms = int(nframes * 1000 / fr)
        return dur_ms, pcm, fr, frame_bytes

    def _windows(self, dur_ms: int):
        step = self.chunk_ms - self.overlap_ms
        t = 0
        while t < dur_ms:
            yield t, min(t + self.chunk_ms, dur_ms)
            t += step

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, cidx, starts, ends, cpay = [], [], [], [], []
        for mid, data in zip(
            batch["media_id"].to_pylist(), batch[self.payload_col].to_pylist()
        ):
            data = data or b""
            wav = None if self.fake is True else self._parse_wav(data)
            if wav is None and self.fake is False:
                continue  # real mode: unparsable payload → zero chunks
            if wav is not None:
                dur_ms, pcm, fr, frame_bytes = wav
                for i, (t, end) in enumerate(self._windows(dur_ms)):
                    ids.append(mid)
                    cidx.append(i)
                    starts.append(t)
                    ends.append(end)
                    a = (t * fr // 1000) * frame_bytes
                    b = (end * fr // 1000) * frame_bytes
                    cpay.append(pcm[a:b])  # the actual PCM slice
            else:
                dur_ms = 5000 + (len(data) * 53) % 3_600_000  # fake duration
                for i, (t, end) in enumerate(self._windows(dur_ms)):
                    ids.append(mid)
                    cidx.append(i)
                    starts.append(t)
                    ends.append(end)
                    cpay.append(
                        hashlib.blake2b(
                            data + t.to_bytes(8, "big"), digest_size=32
                        ).digest()
                    )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(cidx, pa.int32()),
                "start_ms": pa.array(starts, pa.int64()),
                "end_ms": pa.array(ends, pa.int64()),
                "chunk": pa.array(cpay, pa.binary()),
            }
        )


def chunk_audio(ds: Dataset, chunk_ms: int = 30_000, overlap_ms: int = 1_000,
                concurrency=(1, 4),
                batch_size: int = DEFAULT_MEDIA_BATCH_SIZE,
                fake: bool | None = True) -> Dataset:
    return ds.map_batches(
        AudioChunk,
        fn_constructor_kwargs={
            "chunk_ms": chunk_ms, "overlap_ms": overlap_ms, "fake": fake,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------------------ headers

# Real (non-stub) image metadata: container headers carry format and
# pixel dimensions without any codec — this is genuine parsing, not the
# deterministic fake, and needs zero dependencies. The pixel-decode
# stages above stay gated on PIL; everything a catalog/shard-planner
# needs (format routing, dims, aspect filtering, byte budgeting) works
# off these.


def _clamp_dims(fmt: str, w: int, h: int) -> tuple[str, int, int]:
    """Adversarial-header guard: dims outside 1 … 2³¹−1 (int32 output
    range) are corrupt by definition → report the format with 0×0."""
    if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
        return (fmt, 0, 0)
    return (fmt, w, h)


def image_header_dims(data: bytes) -> tuple[str, int, int]:
    """(format, width, height) parsed from the container header alone.

    PNG (IHDR), GIF87a/89a (logical screen), BMP (BITMAPINFOHEADER) and
    JPEG (first SOF0-SOF15 frame marker, skipping entropy-free segments)
    are recognised; anything else returns ("unknown", 0, 0). Truncated
    headers return the format with 0×0 rather than raising, and parsed
    dims outside a plausible pixel range (1 … 2³¹−1) are treated as
    corrupt and reported 0×0 — a corrupt payload is data, not an error
    (O8 never-raises rule), and an adversarial header must not be able
    to overflow the int32 output column."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if len(data) >= 24:
            return _clamp_dims(
                "png",
                int.from_bytes(data[16:20], "big"),
                int.from_bytes(data[20:24], "big"),
            )
        return ("png", 0, 0)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        if len(data) >= 10:
            return _clamp_dims(
                "gif",
                int.from_bytes(data[6:8], "little"),
                int.from_bytes(data[8:10], "little"),
            )
        return ("gif", 0, 0)
    if data[:2] == b"BM":
        # dispatch on the DIB header size at offset 14: 40/52/56/108/124
        # all share the BITMAPINFOHEADER dim layout (32-bit at 18/22);
        # the legacy 12-byte BITMAPCOREHEADER stores 16-bit dims at
        # 18/20. Anything else is unrecognized → ("bmp", 0, 0) rather
        # than misreading plausible-but-wrong dims.
        if len(data) >= 18:
            dib = int.from_bytes(data[14:18], "little")
            if dib in (40, 52, 56, 64, 108, 124) and len(data) >= 26:
                return _clamp_dims(
                    "bmp",
                    int.from_bytes(data[18:22], "little", signed=True),
                    abs(int.from_bytes(data[22:26], "little", signed=True)),
                )
            if dib == 12 and len(data) >= 22:
                return _clamp_dims(
                    "bmp",
                    int.from_bytes(data[18:20], "little"),
                    int.from_bytes(data[20:22], "little"),
                )
        return ("bmp", 0, 0)
    if data[:2] == b"\xff\xd8":
        i, n = 2, len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xDA, 0xD9):
                # SOS / EOI: no SOF seen before scan data or end of image
                # — stop rather than walk entropy-coded bytes where a
                # stray FF Cx would misread as a frame header
                break
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers carry no length
                continue
            seglen = int.from_bytes(data[i + 2 : i + 4], "big")
            if seglen < 2:
                break  # malformed length: stop, report dims unknown
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    return _clamp_dims(
                        "jpeg",
                        int.from_bytes(data[i + 7 : i + 9], "big"),
                        int.from_bytes(data[i + 5 : i + 7], "big"),
                    )
                break
            i += 2 + seglen
        return ("jpeg", 0, 0)
    return ("unknown", 0, 0)


def sniff_image_meta(batch: pa.Table, payload_col: str = "payload") -> pa.Table:
    """Append (format, sniff_width, sniff_height) parsed from each
    payload's container header. Per-row Python is inherent here (each
    header is a variable-length scan) but bounded: only the header
    region of each payload is touched, never the body."""
    fmts, ws, hs = [], [], []
    for data in batch[payload_col].to_pylist():
        f, w, h = image_header_dims(data or b"")
        fmts.append(f)
        ws.append(w)
        hs.append(h)
    return (
        batch.append_column("format", pa.array(fmts, pa.string()))
        .append_column("sniff_width", pa.array(ws, pa.int32()))
        .append_column("sniff_height", pa.array(hs, pa.int32()))
    )


def synth_media_table_headers(n: int = 64, seed: int = 9) -> pa.Table:
    """Deterministic corpus of payloads with REAL container headers
    (PNG/GIF/BMP/JPEG round-robin, plus every 7th row corrupt) and the
    true dims recorded in the metadata columns — lets tests assert the
    header parser against ground truth without any codec."""
    rng = np.random.RandomState(seed)
    ids, payloads, mimes, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.randint(1, 4000))
        h = int(rng.randint(1, 4000))
        body = rng.bytes(int(rng.randint(16, 256)))
        kind = i % 4
        if i % 7 == 3:
            data, mime, w, h = rng.bytes(64), "application/octet-stream", 0, 0
        elif kind == 0:
            data = (
                b"\x89PNG\r\n\x1a\n"
                + (13).to_bytes(4, "big")
                + b"IHDR"
                + w.to_bytes(4, "big")
                + h.to_bytes(4, "big")
                + body
            )
            mime = "image/png"
        elif kind == 1:
            data = (
                b"GIF89a"
                + w.to_bytes(2, "little")
                + h.to_bytes(2, "little")
                + body
            )
            w, h = w % 65536, h % 65536
            mime = "image/gif"
        elif kind == 2:
            # 14-byte file header + BITMAPINFOHEADER (DIB size 40 at
            # offset 14 — the parser dispatches on it)
            data = (
                b"BM"
                + bytes(12)
                + (40).to_bytes(4, "little")
                + w.to_bytes(4, "little")
                + h.to_bytes(4, "little")
                + body
            )
            mime = "image/bmp"
        else:
            app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
            sof0 = (
                b"\xff\xc0"
                + (17).to_bytes(2, "big")
                + b"\x08"
                + h.to_bytes(2, "big")
                + w.to_bytes(2, "big")
                + b"\x03" + bytes(9)
            )
            data = b"\xff\xd8" + app0 + sof0 + body
            w, h = w % 65536, h % 65536
            mime = "image/jpeg"
        ids.append(i)
        payloads.append(data)
        mimes.append(mime)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def video_header_meta(data: bytes) -> tuple[str, int, int]:
    """(container, duration_ms, timescale) parsed from video container
    headers alone — real parsing, no codec. ISO-BMFF/MP4 (box walk to
    moov→mvhd, v0 and v1 layouts) and AVI (RIFF chunk walk to
    hdrl→avih) are recognised; anything else → ("unknown", 0, 0).
    Truncated/corrupt payloads degrade to duration 0, never raise; a
    parsed duration outside 0 … 2⁶³−1 ms is corrupt by definition and
    reports 0 (an adversarial header must not overflow the int64
    output column)."""
    n = len(data)
    if n >= 12 and data[4:8] == b"ftyp":

        def walk(lo: int, hi: int, depth: int = 0):
            i = lo
            while i + 8 <= hi:
                size = int.from_bytes(data[i : i + 4], "big")
                btype = data[i + 4 : i + 8]
                if size == 1 or size < 8:  # 64-bit/invalid sizes: stop
                    return None
                end = min(i + size, hi)
                if btype == b"moov" and depth == 0:
                    r = walk(i + 8, end, 1)
                    if r is not None:
                        return r
                if btype == b"mvhd" and depth == 1 and i + 8 < end:
                    p = i + 8
                    if end - p >= 1:
                        ver = data[p]
                        if ver == 1 and end - p >= 28 + 4:
                            ts = int.from_bytes(data[p + 20 : p + 24], "big")
                            dur = int.from_bytes(data[p + 24 : p + 32], "big")
                        elif ver == 0 and end - p >= 20 + 4:
                            ts = int.from_bytes(data[p + 12 : p + 16], "big")
                            dur = int.from_bytes(data[p + 16 : p + 20], "big")
                        else:
                            return None
                        if ts > 0:
                            ms = dur * 1000 // ts
                            if 0 <= ms <= 0x7FFFFFFFFFFFFFFF:
                                return (ms, ts)
                    return None
                i = end
            return None

        r = walk(0, n)
        return ("mp4", r[0], r[1]) if r else ("mp4", 0, 0)
    if n >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        i = 12
        while i + 8 <= n:
            fourcc = data[i : i + 4]
            size = int.from_bytes(data[i + 4 : i + 8], "little")
            if fourcc == b"LIST" and data[i + 8 : i + 12] == b"hdrl":
                j = i + 12
                end = min(i + 8 + size, n)
                while j + 8 <= end:
                    sub = data[j : j + 4]
                    ssize = int.from_bytes(data[j + 4 : j + 8], "little")
                    if sub == b"avih" and j + 8 + 20 <= end:
                        usec = int.from_bytes(data[j + 8 : j + 12], "little")
                        frames = int.from_bytes(data[j + 24 : j + 28], "little")
                        ms = usec * frames // 1000
                        if not 0 <= ms <= 0x7FFFFFFFFFFFFFFF:
                            ms = 0
                        return ("avi", ms, 1_000_000)
                    j += 8 + ssize + (ssize & 1)
                break
            i += 8 + size + (size & 1)
        return ("avi", 0, 0)
    return ("unknown", 0, 0)


def sniff_video_meta(batch: pa.Table, payload_col: str = "payload") -> pa.Table:
    """Append (container, duration_ms, timescale) from video headers —
    the shard planner's inputs (length bucketing, frame-budgeting)
    without touching a codec."""
    cs, ds_, ts = [], [], []
    for data in batch[payload_col].to_pylist():
        c, d, t = video_header_meta(data or b"")
        cs.append(c)
        ds_.append(d)
        ts.append(t)
    return (
        batch.append_column("container", pa.array(cs, pa.string()))
        .append_column("sniff_duration_ms", pa.array(ds_, pa.int64()))
        .append_column("sniff_timescale", pa.array(ts, pa.int64()))
    )


def synth_video_table_headers(n: int = 48, seed: int = 11) -> pa.Table:
    """Payloads with REAL MP4/AVI headers and ground-truth durations in
    the metadata (every 5th row corrupt)."""
    rng = np.random.RandomState(seed)
    ids, payloads, mimes, durs, scales = [], [], [], [], []
    for i in range(n):
        body = rng.bytes(int(rng.randint(16, 128)))
        if i % 5 == 2:
            data, mime, dur_ms = rng.bytes(48), "application/octet-stream", 0
            timescale = 0
        elif i % 2 == 0:
            ts = int(rng.choice([600, 1000, 90000]))
            dur_units = int(rng.randint(1, 10_000_000))
            mvhd_payload = (
                b"\x00" + bytes(3) + bytes(8)
                + ts.to_bytes(4, "big") + dur_units.to_bytes(4, "big") + bytes(80)
            )
            mvhd = (8 + len(mvhd_payload)).to_bytes(4, "big") + b"mvhd" + mvhd_payload
            moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
            ftyp = (16).to_bytes(4, "big") + b"ftypisom" + bytes(4)
            data = ftyp + moov + body
            mime = "video/mp4"
            dur_ms = dur_units * 1000 // ts
            timescale = ts
        else:
            usec = int(rng.choice([16667, 33333, 40000]))
            frames = int(rng.randint(1, 100_000))
            avih = b"avih" + (56).to_bytes(4, "little") + usec.to_bytes(
                4, "little"
            ) + bytes(12) + frames.to_bytes(4, "little") + bytes(36)
            hdrl = b"LIST" + (4 + len(avih)).to_bytes(4, "little") + b"hdrl" + avih
            data = b"RIFF" + (4 + len(hdrl) + len(body)).to_bytes(
                4, "little"
            ) + b"AVI " + hdrl + body
            mime = "video/x-msvideo"
            dur_ms = usec * frames // 1000
            timescale = 1_000_000  # the parser reports AVI rates in µs
        ids.append(i)
        payloads.append(data)
        mimes.append(mime)
        durs.append(dur_ms)
        scales.append(timescale)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "duration_ms": pa.array(durs, pa.int64()),
            "timescale": pa.array(scales, pa.int64()),
        }
    )


class EmbedImage:
    """Actor-pool feature-EXTRACTION stage — the embed step between
    decode and the similarity family (reference analog: the feature
    vectors the OCR engine's layout model consumes internally).

    Emits a unit-norm ``emb_dim``-float32 embedding per row under
    ``emb`` (list<float32>), ready for ``brute_force_topk`` /
    ``embedding_near_dup_pairs`` / ``semantic_dedup`` over media.

    ``fake`` contract mirrors ``DecodeImage``: real path = PIL loaded
    once per actor in ``__init__``, features are the row-major 8×8
    grayscale thumbnail (64 dims, mean-centered, L2-normalized — a
    real, model-free visual feature: near-identical images land near
    cosine 1); stub path derives a deterministic unit vector from a
    blake2b stream over the payload bytes, so identical payloads embed
    identically and the downstream plumbing (schema, batch size, actor
    signature, dedup behavior) is fully testable without codecs.
    Undecodable rows on the real path get the all-zeros vector (the
    never-drop contract; zero norm is the documented sentinel).
    """

    EMB_DIM = 64

    def __init__(self, fake: bool | None = True, payload_col: str = "payload"):
        self._pil = None
        if fake is None:
            self._pil = _try_pil()
        elif not fake:
            self._pil = _try_pil()
            if self._pil is None:
                raise NotImplementedError(
                    "real image embedding requires PIL, not present in this "
                    "environment; construct with fake=True for the "
                    "deterministic stub or fake=None to auto-fall-back"
                )
        self.payload_col = payload_col

    @staticmethod
    def _fake_vec(data: bytes) -> np.ndarray:
        # 64 floats from a 128-byte blake2b XOF stream: deterministic,
        # payload-identical ⇒ embedding-identical
        h = hashlib.blake2b(data, digest_size=64)
        raw = h.digest() + hashlib.blake2b(
            data, digest_size=64, person=b"lane2"
        ).digest()
        v = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 255.0
        v = v.reshape(2, 64).sum(axis=0) - 1.0
        n = float(np.linalg.norm(v))
        return v / n if n else v

    def _real_vec(self, data: bytes) -> np.ndarray:
        import io

        try:
            img = self._pil.open(io.BytesIO(data))
            small = np.asarray(
                img.convert("L").resize((8, 8)), dtype=np.float32
            ).reshape(-1)
            small -= small.mean()
            n = float(np.linalg.norm(small))
            return small / n if n else np.zeros(self.EMB_DIM, np.float32)
        except Exception:
            return np.zeros(self.EMB_DIM, np.float32)  # sentinel: norm 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        vec = self._real_vec if self._pil is not None else self._fake_vec
        out = np.empty((len(payloads), self.EMB_DIM), dtype=np.float32)
        for i, data in enumerate(payloads):
            out[i] = vec(data or b"")
        return batch.drop_columns([self.payload_col]).append_column(
            "emb", pa.array(list(out), type=pa.list_(pa.float32()))
        )


def embed_images(
    ds: Dataset,
    concurrency=(1, 4),
    batch_size: int = DEFAULT_MEDIA_BATCH_SIZE,
    fake: bool | None = True,
) -> Dataset:
    return ds.map_batches(
        EmbedImage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
