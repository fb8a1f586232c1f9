"""Deterministic synthetic transcript generator (FIXTURES.md §1).

A pure function of ``(seed, n_convs)`` — no wall-clock, no ambient
randomness — emitting the flagship ``transcripts`` table with mixed
payload kinds per turn, mirroring the reference's input diversity
(PDFs with/without prior text, valid/corrupt files; SURVEY.md §2.2
O7/O8/O10):

* ``html``       — main content wrapped in nav/footer/ad boilerplate
* ``pdfstream``  — ``%PDF-SIM`` layout runs in scrambled order
* ``toolmark``   — HOCR-analog ``<w p b>`` word markup
* ``plain``      — already-clean text (skip path)
* corrupt variants of each (truncated records, bad coords, nul bytes)

Unicode coverage includes RTL Hebrew (the reference's default language
pack is ``heb+eng``, ocr_combined.py:116), NBSP, zero-width characters
and CRLF newlines, to exercise normalizer determinism.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_processor_ray.schema import TRANSCRIPT_SCHEMA

# Bump whenever generator output changes — callers key their /tmp corpus
# caches on this so a stale corpus is never silently reused.
SYNTH_VERSION = 1

_WORDS_EN = (
    "the quick brown fox jumps over lazy dog stream table shuffle block "
    "partition actor batch arrow parquet layout density content boiler "
    "extract normalize span offset page line word turn conversation"
).split()
_WORDS_HEB = "שלום עולם טקסט עמוד שורה מילה תוכן חילוץ".split()
_NOISY = ["café", "naïve", "résumé", "À", "écol​e", "﻿start", "a b"]

_BASE_TS = 1704067200_000000  # 2024-01-01T00:00:00Z in microseconds


def _words(rng: random.Random, n: int) -> list[str]:
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.82:
            out.append(rng.choice(_WORDS_EN))
        elif r < 0.94:
            out.append(rng.choice(_WORDS_HEB))
        else:
            out.append(rng.choice(_NOISY))
    return out


def _sentence(rng: random.Random, lo: int = 4, hi: int = 14) -> str:
    return " ".join(_words(rng, rng.randint(lo, hi)))


def _make_html(rng: random.Random) -> str:
    nav = f'<nav><a href="/a">{_sentence(rng, 1, 3)}</a> <a href="/b">{_sentence(rng, 1, 3)}</a></nav>'
    ad = f'<div class="ad-banner">{_sentence(rng, 2, 5)}</div>'
    paras = "".join(
        f"<p>{_sentence(rng, 6, 20)}</p>" for _ in range(rng.randint(1, 5))
    )
    heading = f"<h2>{_sentence(rng, 2, 5)}</h2>"
    linkspam = (
        '<p><a href="/x">' + _sentence(rng, 3, 6) + '</a> <a href="/y">'
        + _sentence(rng, 3, 6) + "</a></p>"
    )
    footer = f"<footer>{_sentence(rng, 3, 6)}</footer>"
    script = "<script>var x = 1;</script>"
    use_main = rng.random() < 0.6
    body = heading + paras + linkspam
    if use_main:
        core = f"<main>{body}</main>"
    else:
        core = f'<div class="content">{body}</div>'
    return f"<div>{nav}{ad}{core}{script}{footer}</div>"


def _make_pdfstream(rng: random.Random) -> str:
    records = []
    n_pages = rng.randint(1, 3)
    for page in range(1, n_pages + 1):
        n_lines = rng.randint(2, 8)
        for li in range(n_lines):
            y = 40 + li * 14
            n_runs = rng.randint(1, 3)
            x = 10
            for _ in range(n_runs):
                run = _sentence(rng, 1, 5)
                records.append(f"R {page} {y} {x} {run}")
                x += 90 + rng.randint(0, 40)
    rng.shuffle(records)  # stream order is scrambled; parser must reorder
    return "%PDF-SIM 1.4\n" + "\n".join(records) + "\n%%EOF"


def _make_toolmark(rng: random.Random, tool: str) -> str:
    ws = []
    n_pages = rng.randint(1, 2)
    for page in range(1, n_pages + 1):
        for li in range(rng.randint(1, 5)):
            y = 20 + li * 20
            x = 10
            for _ in range(rng.randint(2, 6)):
                w = rng.choice(_WORDS_EN + _WORDS_HEB)
                ws.append(f'<w p="{page}" b="{x} {y} {x + 12 * len(w)} {y + 16}">{w}</w>')
                x += 12 * len(w) + 8
    rng.shuffle(ws)
    return f'<tool name="{tool}">\n' + "".join(ws) + "\n</tool>"


def _make_plain(rng: random.Random) -> str:
    lines = [_sentence(rng, 4, 16) for _ in range(rng.randint(1, 6))]
    sep = "\r\n" if rng.random() < 0.3 else "\n"
    return sep.join(lines)


def _make_corrupt(rng: random.Random) -> str:
    choice = rng.randint(0, 3)
    if choice == 0:
        return "%PDF-SIM 1.4\nR 1 abc 10 broken coords\n%%EOF"
    if choice == 1:
        return "%PDF-SIMx\nR 1 10 10 bad header version"
    if choice == 2:
        return '<tool name="t">\n<w p="1" b="10 20 30">threecoords</w><w p="1" b="'
    return "plain with \x00 nul byte " + _sentence(rng, 3, 8)


def make_transcripts(
    seed: int = 7,
    n_convs: int = 100,
    skew_every: int = 37,
    skew_turns: int = 1200,
    conv_range: tuple[int, int] | None = None,
) -> pa.Table:
    """Build the transcripts table. Every ``skew_every``-th conversation is
    a long one (``skew_turns`` turns) to exercise salted-split skew handling.

    ``conv_range=(lo, hi)`` generates only conversations ``lo..hi-1`` —
    each conversation has its own seeded RNG stream, so ranges generated
    independently (e.g. by parallel Ray tasks) concatenate to exactly the
    full table.
    """
    lo, hi = conv_range if conv_range is not None else (0, n_convs)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    for ci in range(lo, hi):
        rng = random.Random((seed << 20) ^ ci)  # per-conv stream: order-independent
        conv = f"conv-{ci:06d}"
        if skew_every and ci % skew_every == skew_every - 1:
            n_turns = skew_turns + rng.randint(0, skew_turns // 4)
        else:
            n_turns = rng.randint(2, 20)
        t0 = _BASE_TS + ci * 3600_000000
        for ti in range(n_turns):
            r = rng.random()
            if r < 0.28:
                role, tool, text = "user", "", _make_plain(rng)
            elif r < 0.50:
                role, tool, text = "assistant", "", _make_html(rng)
            elif r < 0.68:
                role, tool, text = "tool", "pdf_reader", _make_pdfstream(rng)
            elif r < 0.84:
                tool = rng.choice(["search", "browser", "calculator"])
                role, text = "tool", _make_toolmark(rng, tool)
            elif r < 0.95:
                role, tool, text = "assistant", "", _make_plain(rng)
            else:
                role, tool, text = "tool", "flaky_tool", _make_corrupt(rng)
            conv_ids.append(conv)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(t0 + ti * 7_000000)
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def write_transcripts(
    out_dir: str,
    seed: int = 7,
    n_convs: int = 100,
    rows_per_file: int = 20000,
    **kwargs,
) -> str:
    """Write the table as multiple Parquet files (block parallelism at read).

    Rows are shuffled deterministically before writing so that a single
    conversation's turns land in different files — the pipeline must NOT
    rely on input locality for ordering.
    """
    table = make_transcripts(seed=seed, n_convs=n_convs, **kwargs)
    idx = list(range(table.num_rows))
    random.Random(seed ^ 0x5EED).shuffle(idx)
    table = table.take(pa.array(idx, pa.int64()))
    os.makedirs(out_dir, exist_ok=True)
    n_files = max(1, (table.num_rows + rows_per_file - 1) // rows_per_file)
    for i in range(n_files):
        chunk = table.slice(i * rows_per_file, rows_per_file)
        pq.write_table(chunk, os.path.join(out_dir, f"transcripts-{i:04d}.parquet"))
    return out_dir


def write_transcripts_parallel(
    out_dir: str,
    seed: int = 7,
    n_convs: int = 2000,
    convs_per_task: int = 250,
    **kwargs,
) -> int:
    """Generate a large corpus with parallel Ray tasks, one conv-range per
    task (per-conv RNG streams make ranges independent). Returns total
    turn count. Requires an initialised Ray session."""
    import ray

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def gen_range(lo: int, hi: int) -> int:
        t = make_transcripts(seed=seed, n_convs=n_convs, conv_range=(lo, hi), **kwargs)
        pq.write_table(t, os.path.join(out_dir, f"transcripts-{lo:07d}.parquet"))
        return t.num_rows

    futs = [
        gen_range.remote(lo, min(lo + convs_per_task, n_convs))
        for lo in range(0, n_convs, convs_per_task)
    ]
    return sum(ray.get(futs))
