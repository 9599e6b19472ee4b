"""ORC + Feather/IPC source contracts: byte-parity with the parquet
original, per-stripe/per-batch streaming, projection, idempotent sink."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import orc as paorc

from audio_feature_extraction_ray.pipelines.io_formats import (
    build_orc_fixture,
    read_ipc,
    read_orc,
    write_orc,
)


def _table(n=1000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "a": pa.array(np.arange(n, dtype=np.int64)),
            "b": pa.array(rng.standard_normal(n)),
            "s": pa.array([f"row-{i}" for i in range(n)], pa.string()),
        }
    )


def test_read_orc_parity_and_stripe_streaming(ray_session, tmp_path):
    # enough rows that a small stripe_size actually splits stripes (the ORC
    # writer enforces a row-batch floor below which one stripe absorbs all)
    t = _table(60_000)
    # tiny stripes force the multi-stripe path; stripes_per_block=2 forces
    # the chunked yield
    paorc.write_table(t, str(tmp_path / "x.orc"), stripe_size=64 * 1024)
    assert paorc.ORCFile(str(tmp_path / "x.orc")).nstripes > 2
    got = (
        read_orc(str(tmp_path), stripes_per_block=2)
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert got["a"].tolist() == t.column("a").to_pylist()
    assert got["s"].tolist() == t.column("s").to_pylist()
    assert np.allclose(got["b"].to_numpy(), t.column("b").to_numpy())


def test_read_orc_projection(ray_session, tmp_path):
    paorc.write_table(_table(100), str(tmp_path / "x.orc"))
    got = read_orc(str(tmp_path), columns=["a"]).to_pandas()
    assert list(got.columns) == ["a"]
    assert len(got) == 100


def test_read_ipc_parity_multi_batch(ray_session, tmp_path):
    t = _table(500)
    with pa.OSFile(str(tmp_path / "x.feather"), "wb") as f:
        w = pa.ipc.new_file(f, t.schema)
        for i in range(0, 500, 100):  # 5 record batches
            w.write_table(t.slice(i, 100))
        w.close()
    got = (
        read_ipc(str(tmp_path))
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert got["a"].tolist() == t.column("a").to_pylist()
    got_b = read_ipc(str(tmp_path), columns=["s", "a"]).to_pandas()
    assert sorted(got_b.columns) == ["a", "s"]


def test_write_orc_idempotent_and_readable(ray_session, tmp_path):
    import ray

    t = _table(300)
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "out")
    n1 = write_orc(ds, out, rows_per_file=100)
    assert n1 >= 1
    # second write of identical content lands the same content-hash names
    import glob

    files = sorted(glob.glob(f"{out}/part-*.orc"))
    write_orc(ray.data.from_arrow(t), out, rows_per_file=100)
    assert sorted(glob.glob(f"{out}/part-*.orc")) == files
    got = read_orc(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == t.column("a").to_pylist()


def test_orc_fixture_done_marker(ray_session):
    root1 = build_orc_fixture("/root/testdata/sf0.001")
    root2 = build_orc_fixture("/root/testdata/sf0.001")
    assert root1 == root2
    import os

    assert os.path.exists(os.path.join(root1, "_DONE"))
