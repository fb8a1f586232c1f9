"""Multi-format source readers: JSONL and CSV corpora must extract
byte-identically to the canonical Parquet path."""

import csv
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus_dirs(tmp_path_factory):
    """One small synthetic corpus written in all three formats."""
    from ocr_processor_ray.sources.synth import write_transcripts

    root = tmp_path_factory.mktemp("fmt_corpus")
    pq_dir = os.path.join(root, "pq")
    write_transcripts(pq_dir, seed=11, n_convs=20)
    files = sorted(
        os.path.join(pq_dir, f) for f in os.listdir(pq_dir) if f.endswith(".parquet")
    )
    t = pa.concat_tables([pq.read_table(f) for f in files])

    json_path = os.path.join(root, "corpus.jsonl")
    csv_path = os.path.join(root, "corpus.csv")
    rows = t.to_pylist()
    with open(json_path, "w") as f:
        for r in rows:
            r = dict(r)
            r["ts"] = int(r["ts"].timestamp() * 1_000_000)
            f.write(json.dumps(r) + "\n")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=[fld.name for fld in t.schema])
        w.writeheader()
        for r in rows:
            r = dict(r)
            r["ts"] = int(r["ts"].timestamp() * 1_000_000)
            w.writerow(r)
    return {"parquet": pq_dir, "json": json_path, "csv": csv_path}


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_format_extracts_identically_to_parquet(corpus_dirs, fmt):
    from ocr_processor_ray.pipelines.extract_pipeline import extract_turns
    from ocr_processor_ray.sources.readers import read_transcripts_any

    def run(format_name):
        ds = read_transcripts_any(corpus_dirs[format_name], format=format_name)
        out = extract_turns(ds).to_pandas()
        return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)

    base = run("parquet")
    other = run(fmt)
    assert base.equals(other), f"{fmt} extraction diverges from parquet"


@pytest.mark.usefixtures("ray_session")
def test_normalized_schema_matches_canonical(corpus_dirs):
    from ocr_processor_ray.schema import TRANSCRIPT_SCHEMA
    from ocr_processor_ray.sources.readers import read_transcripts_any

    ds = read_transcripts_any(corpus_dirs["json"], format="json")
    t = pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")]
    )
    assert t.schema.equals(TRANSCRIPT_SCHEMA)


def test_unknown_format_rejected():
    from ocr_processor_ray.sources.readers import read_transcripts_any

    with pytest.raises(ValueError):
        read_transcripts_any("/tmp/x", format="xml")


@pytest.mark.usefixtures("ray_session")
def test_checkpointed_run_from_jsonl_matches_parquet(corpus_dirs, tmp_path):
    from ocr_processor_ray import ExtractConfig
    from ocr_processor_ray.state.checkpoint import run_checkpointed
    from ocr_processor_ray.state.manifest import read_output

    cfg = ExtractConfig(num_output_partitions=4)
    run_checkpointed(corpus_dirs["parquet"], str(tmp_path / "pq"), cfg)
    run_checkpointed(
        corpus_dirs["json"], str(tmp_path / "js"), cfg, input_format="json"
    )
    a = read_output(str(tmp_path / "pq")).to_pandas()
    b = read_output(str(tmp_path / "js")).to_pandas()
    key = ["conv_id", "turn_idx"]
    assert a.sort_values(key, ignore_index=True).equals(
        b.sort_values(key, ignore_index=True)
    )


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_export_result_roundtrip(tmp_path, fmt):
    import pandas as pd

    from ocr_processor_ray.pipelines.export import export_result

    t = pa.table({"k": pa.array(["a", "b"]), "n": pa.array([1, 2], pa.int64())})
    out = str(tmp_path / fmt)
    export_result(t, out, fmt)
    files = os.listdir(out)
    assert len(files) == 1
    path = os.path.join(out, files[0])
    if fmt == "parquet":
        back = pq.read_table(path).to_pandas()
    elif fmt == "csv":
        back = pd.read_csv(path)
    else:
        back = pd.read_json(path, lines=True)
    assert back.sort_values("k", ignore_index=True).equals(
        t.to_pandas().sort_values("k", ignore_index=True)
    )


@pytest.mark.usefixtures("ray_session")
def test_read_media_dir_discovers_files(tmp_path):
    from ocr_processor_ray.functions.multimodal import MEDIA_SCHEMA, decode_images
    from ocr_processor_ray.sources.readers import read_media_dir

    root = tmp_path / "media"
    (root / "sub").mkdir(parents=True)
    files = {
        "a.png": b"\x89PNG fake" * 10,
        "b.jpg": b"\xff\xd8 fake jpeg" * 5,
        "sub/c.wav": b"RIFF fake wav" * 7,
        "sub/d.unknownext": b"????",
    }
    for rel, data in files.items():
        (root / rel).write_bytes(data)
    ds = read_media_dir(str(root))
    df = ds.to_pandas()
    assert len(df) == 4
    t = pa.Table.from_pandas(df, preserve_index=False)
    assert {f.name for f in t.schema} == {f.name for f in MEDIA_SCHEMA}
    assert set(df["mime"]) == {
        "image/png", "image/jpeg", "audio/wav", "application/octet-stream"
    }
    assert df["media_id"].nunique() == 4 and (df["media_id"] >= 0).all()
    assert sorted(df["payload"].map(len)) == sorted(len(v) for v in files.values())
    # the crawl output feeds the decode stage directly
    feats = decode_images(ds).to_pandas()
    assert len(feats) == 4


def test_export_unknown_format_rejected(tmp_path):
    from ocr_processor_ray.pipelines.export import export_result

    with pytest.raises(ValueError):
        export_result(pa.table({"a": [1]}), str(tmp_path), "xlsx")
