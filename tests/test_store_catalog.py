"""Store catalog: discovery, membership, delete with dir pruning
(FIXTURES F5 weather shape; reference test model:
``tests/test_store/test_store/test_store.py``)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from oups_spark.store.indexer import toplevel
from oups_spark.store.store import Store


@toplevel
class WeatherKey:
    country: str
    city: str


@pytest.fixture()
def wstore(spark, scratch):
    return Store(spark, os.path.join(scratch, "store"), WeatherKey)


def _weather(start, days):
    return pd.DataFrame(
        {
            "ts": pd.date_range(start, periods=days, freq="D"),
            "temperature": range(10, 10 + days),
            "humidity": range(60, 60 + days),
        }
    )


def test_store_write_discover_delete(spark, wstore):
    berlin = WeatherKey("germany", "berlin")
    paris = WeatherKey("france", "paris")
    assert len(wstore) == 0 and berlin not in wstore
    wstore[berlin].write(df=spark.createDataFrame(_weather("2024-01-01", 5)), ordered_on="ts")
    wstore[paris].write(df=spark.createDataFrame(_weather("2024-01-03", 5)), ordered_on="ts")
    assert berlin in wstore and paris in wstore
    assert wstore.keys() == [paris, berlin]  # sorted: france < germany
    assert len(wstore) == 2

    # incremental append through the catalog handle
    wstore[berlin].write(df=spark.createDataFrame(_weather("2024-01-06", 2)))
    assert wstore[berlin].n_rows == 7

    del wstore[berlin]
    assert berlin not in wstore
    assert not os.path.exists(os.path.join(wstore.basepath, "germany-berlin"))
    assert len(wstore) == 1


def test_store_rejects_foreign_key(wstore):
    @toplevel
    class Other:
        x: str

    with pytest.raises(TypeError):
        wstore[Other("a")]


def test_manifest_swap_contract(tmp_path):
    """The manifest commit contract (local/HDFS atomic-rename backend):
    a reader sees the old or the new manifest, never a partial one; a
    crashed writer's half-written tmp file is invisible to readers and
    swept by the next successful save."""
    from oups_spark.store.manifest import MANIFEST_NAME, FileEntry, Manifest

    d = str(tmp_path)
    m = Manifest(ordered_on="ts")
    m.files = [FileEntry(name="f1.parquet", n_rows=10, min=1, max=2)]
    m.save(d)
    assert not os.path.exists(os.path.join(d, MANIFEST_NAME + ".tmp"))

    # crashed writer: half-written tmp must not affect readers
    tmp = os.path.join(d, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        fh.write('{"version": 1, "ordered_on": "ts", "files": [{"na')
    loaded = Manifest.load(d)
    assert [f.name for f in loaded.files] == ["f1.parquet"]

    # the next save goes through the same tmp path and swaps cleanly
    m.files.append(FileEntry(name="f2.parquet", n_rows=5, min=3, max=4))
    m.save(d)
    assert not os.path.exists(tmp)
    loaded2 = Manifest.load(d)
    assert [f.name for f in loaded2.files] == ["f1.parquet", "f2.parquet"]
    assert loaded2.n_rows == 15
