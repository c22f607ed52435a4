"""Filter.db bloom component: serialization roundtrip, the no-false-
negative invariant, the fp-rate bound, and the point-lookup skip -- a
definitely-absent key must cost ONE bloom probe per non-owning sstable,
with zero Statistics/Summary/Index IO (the 100 TB lookup shape: 5,000
files on disk, 5 files touched)."""

from __future__ import annotations

import os

import pytest

from cassandra_sstable_to_protocolbuf_spark.sources import sstable_native as N


def test_roundtrip_and_layout(tmp_path):
    b = N.BloomFilter.build(500, 0.01)
    for i in range(500):
        b.add(b"key-%d" % i)
    path = str(tmp_path / "x-Filter.db")
    b.write(path)
    back = N.BloomFilter.parse(path)
    assert back.hash_count == b.hash_count
    assert back.words == b.words
    # layout: int hashCount, int wordCount, big-endian longs
    raw = open(path, "rb").read()
    assert len(raw) == 8 + 8 * len(b.words)
    assert int.from_bytes(raw[0:4], "big") == b.hash_count
    assert int.from_bytes(raw[4:8], "big") == len(b.words)


def test_no_false_negatives_and_fp_bound():
    n = 2000
    b = N.BloomFilter.build(n, 0.01)
    keys = [b"doc|%d|%d" % (i, i * 31) for i in range(n)]
    for k in keys:
        b.add(k)
    assert all(b.might_contain(k) for k in keys), "false negative!"
    fp = sum(b.might_contain(b"absent-%d" % i) for i in range(20_000))
    assert fp / 20_000 < 0.03, f"fp rate {fp / 20_000} vs 0.01 target"


def test_parse_rejects_corruption(tmp_path):
    good = str(tmp_path / "g-Filter.db")
    b = N.BloomFilter.build(10, 0.01)
    b.write(good)
    raw = open(good, "rb").read()
    for name, blob in [
        ("trunc-header", raw[:6]),
        ("trunc-words", raw[:-4]),
        ("oversized", raw + b"\x00" * 8),
        ("bad-params", b"\x00\x00\x00\x00" + raw[4:]),
    ]:
        bad = str(tmp_path / f"{name}-Filter.db")
        with open(bad, "wb") as f:
            f.write(blob)
        with pytest.raises(ValueError):
            N.BloomFilter.parse(bad)


def test_writer_emits_filter_component(tmp_path):
    parts = [{"key": b"k%03d" % i,
              "cells": [{"name": b"c", "kind": "LIVE", "timestamp": 1,
                         "value": b"v"}]} for i in range(300)]
    data = N.write_sstable(str(tmp_path), 1, parts)
    filt = data[:-len(N.DATA_SUFFIX)] + N.FILTER_SUFFIX
    assert os.path.exists(filt)
    bloom = N.BloomFilter.parse(filt)
    assert all(bloom.might_contain(b"k%03d" % i) for i in range(300))
    # sized for 300 keys at the 1% default: ~10 bits/key
    assert 2048 <= len(bloom.words) * 64 <= 8192


def test_point_lookup_skips_non_owning_files(spark, tmp_path, monkeypatch):
    """Two sstables, a key unique to the first: planning must consult
    the second file's bloom and then touch NONE of its Summary/Index --
    and the scan result is exactly the one partition."""
    def mk(cf, keys):
        parts = [{"key": k, "cells": [{"name": b"c", "kind": "LIVE",
                                       "timestamp": 1, "value": cf.encode()}]}
                 for k in keys]
        return N.write_sstable(str(tmp_path), 1, parts, cf=cf)

    a = mk("aa", [b"only-in-a"] + [b"a%02d" % i for i in range(40)])
    mk("bb", [b"b%02d" % i for i in range(40)])

    touched: list[str] = []
    real_summary, real_index = N.load_summary, N.iter_index

    def spy_summary(data_path):
        touched.append(("summary", os.path.basename(data_path)))
        return real_summary(data_path)

    def spy_index(index_path, start_pos=0):
        touched.append(("index", os.path.basename(index_path)))
        return real_index(index_path, start_pos)

    monkeypatch.setattr(N, "load_summary", spy_summary)
    monkeypatch.setattr(N, "iter_index", spy_index)

    reader = N.SSTableNativeReader(str(tmp_path), 4096)
    reader.pushed_keys = {b"only-in-a"}
    splits = reader.partitions()
    assert len(splits) == 1 and splits[0].data_path == a

    bb_touches = [t for t in touched if "-bb-" in t[1]]
    assert bb_touches == [], f"non-owning file IO: {bb_touches}"
    aa_summary = [t for t in touched if t[0] == "summary" and "-aa-" in t[1]]
    assert aa_summary, "owning file should plan through its summary"

    def row_keys(split):
        out = set()
        for item in reader.read(split):
            # the DataSource read yields Arrow batches or tuples
            if hasattr(item, "column"):
                out.update(item.column(1).to_pylist())
            else:
                k = item[1]
                out.add(k.as_py() if hasattr(k, "as_py") else bytes(k))
        return out

    assert row_keys(splits[0]) == {b"only-in-a"}


def test_lookup_still_works_without_filter_component(spark, tmp_path):
    """Pre-bloom sstables (no Filter.db) stay seekable: the gate is an
    optimization, never a requirement."""
    parts = [{"key": b"k%02d" % i, "cells": [{"name": b"c", "kind": "LIVE",
                                              "timestamp": 1, "value": b"v"}]}
             for i in range(20)]
    data = N.write_sstable(str(tmp_path), 1, parts)
    os.unlink(data[:-len(N.DATA_SUFFIX)] + N.FILTER_SUFFIX)
    reader = N.SSTableNativeReader(str(tmp_path), 4096)
    reader.pushed_keys = {b"k07"}
    splits = reader.partitions()
    assert len(splits) == 1
    out = set()
    for item in reader.read(splits[0]):
        if hasattr(item, "column"):
            out.update(item.column(1).to_pylist())
        else:
            k = item[1]
            out.add(k.as_py() if hasattr(k, "as_py") else bytes(k))
    assert out == {b"k07"}


def test_digest_and_toc_components(tmp_path, capsys):
    """-Digest.sha1 records the sha1 of the PHYSICAL Data.db bytes
    (accumulated while streaming, both compressed and plain), -TOC.txt
    lists the components, and verify-digest catches a flipped byte."""
    import hashlib

    from cassandra_sstable_to_protocolbuf_spark.__main__ import main

    parts = [{"key": b"k%03d" % i,
              "cells": [{"name": b"c", "kind": "LIVE", "timestamp": 1,
                         "value": b"v" * 50}]} for i in range(200)]
    for cf, comp in (("plain", None), ("lz", "lz4")):
        data = N.write_sstable(str(tmp_path), 1, parts, cf=cf,
                               compression=comp)
        base = data[:-len(N.DATA_SUFFIX)]
        recorded = open(base + N.DIGEST_SUFFIX).read().split()[0]
        actual = hashlib.sha1(open(data, "rb").read()).hexdigest()
        assert recorded == actual, f"{cf}: digest not over physical bytes"
        toc = open(base + N.TOC_SUFFIX).read().splitlines()
        assert "Data.db" in toc and "Index.db" in toc and "TOC.txt" in toc
        assert ("CompressionInfo.db" in toc) == (comp == "lz4")
        assert N.verify_digest(data) is True

    assert main(["verify-digest", str(tmp_path)]) == 0
    assert "2 sstable(s), 0 digest failure(s)" in capsys.readouterr().out

    # flip one byte of the plain table: the sweep must fail loudly
    bad = str(tmp_path / ("ks-plain-ka-1" + N.DATA_SUFFIX))
    with open(bad, "r+b") as f:
        f.seek(100)
        b = f.read(1)[0]
        f.seek(-1, os.SEEK_CUR)
        f.write(bytes([b ^ 0xFF]))
    assert N.verify_digest(bad) is False
    assert main(["verify-digest", str(tmp_path)]) == 1
    assert "1 digest failure(s)" in capsys.readouterr().out


def test_statistics_records_real_fp_chance(tmp_path):
    """close() must stamp the fp chance it actually built the filter
    with (the provenance key), and 1.0 only when no filter exists."""
    parts = [{"key": b"k%02d" % i, "cells": [{"name": b"c", "kind": "LIVE",
                                              "timestamp": 1, "value": b"v"}]}
             for i in range(20)]
    data = N.write_sstable(str(tmp_path), 1, parts, cf="withbloom")
    stats = N.read_statistics(data[:-len(N.DATA_SUFFIX)] + N.STATS_SUFFIX)
    assert stats["bloom_fp_chance"] == 0.01

    w = N.SSTableStreamWriter(str(tmp_path), 2, cf="nobloom",
                              bloom_fp_chance=None)
    w.start_partition(b"k")
    w.add_cell(b"c", "LIVE", 1, b"v")
    w.end_partition()
    data2 = w.close()
    stats2 = N.read_statistics(data2[:-len(N.DATA_SUFFIX)] + N.STATS_SUFFIX)
    assert stats2["bloom_fp_chance"] == 1.0
    assert not os.path.exists(data2[:-len(N.DATA_SUFFIX)] + N.FILTER_SUFFIX)


def test_foreign_bloom_is_not_trusted(tmp_path):
    """A Filter.db without this engine's provenance (Statistics.db
    missing, unparseable, or fp sentinel 1.0) must NOT gate lookups:
    foreign Cassandra blooms use Java abs-signed indexing, so trusting
    one risks silent false negatives. Planning must fall back to exact
    index seeks and still find the key."""
    parts = [{"key": b"k%02d" % i, "cells": [{"name": b"c", "kind": "LIVE",
                                              "timestamp": 1, "value": b"v"}]}
             for i in range(20)]
    data = N.write_sstable(str(tmp_path), 1, parts, cf="foreign")
    base = data[:-len(N.DATA_SUFFIX)]
    assert N.load_trusted_bloom(data) is not None  # our own: trusted

    # (a) Statistics.db replaced with foreign/unparseable bytes
    with open(base + N.STATS_SUFFIX, "wb") as f:
        f.write(b"\x00\x00\x00\x09" + b"\xde\xad\xbe\xef" * 10)
    assert N.load_trusted_bloom(data) is None
    # (b) Statistics.db absent entirely
    os.unlink(base + N.STATS_SUFFIX)
    assert N.load_trusted_bloom(data) is None
    # (c) fp sentinel 1.0 alongside a (suspicious) Filter.db
    N.write_statistics(base + N.STATS_SUFFIX, bloom_fp_chance=1.0)
    assert N.load_trusted_bloom(data) is None
    assert N.load_bloom(data) is not None  # the component itself parses

    # untrusted bloom => exact index fallback still finds the key
    reader = N.SSTableNativeReader(str(tmp_path), 4096)
    reader.pushed_keys = {b"k07"}
    splits = reader.partitions()
    assert len(splits) == 1


def test_corrupt_trusted_bloom_falls_back(tmp_path):
    """A truncated Filter.db under valid provenance degrades to exact
    index seeks rather than failing the plan."""
    parts = [{"key": b"k%02d" % i, "cells": [{"name": b"c", "kind": "LIVE",
                                              "timestamp": 1, "value": b"v"}]}
             for i in range(20)]
    data = N.write_sstable(str(tmp_path), 1, parts)
    filt = data[:-len(N.DATA_SUFFIX)] + N.FILTER_SUFFIX
    raw = open(filt, "rb").read()
    with open(filt, "wb") as f:
        f.write(raw[:10])
    assert N.load_trusted_bloom(data) is None
    reader = N.SSTableNativeReader(str(tmp_path), 4096)
    reader.pushed_keys = {b"k07"}
    assert len(reader.partitions()) == 1


def test_malformed_digest_component_reports_mismatch(tmp_path):
    """An empty or garbage -Digest.sha1 is a FAIL, not an IndexError:
    the verify sweep must keep going past it."""
    from cassandra_sstable_to_protocolbuf_spark.__main__ import main

    parts = [{"key": b"k", "cells": [{"name": b"c", "kind": "LIVE",
                                      "timestamp": 1, "value": b"v"}]}]
    data = N.write_sstable(str(tmp_path), 1, parts)
    digest = data[:-len(N.DATA_SUFFIX)] + N.DIGEST_SUFFIX
    for blob in (b"", b"   \n", b"nothex!" * 6, b"abc123\n"):
        with open(digest, "wb") as f:
            f.write(blob)
        assert N.verify_digest(data) is False, repr(blob)
    assert main(["verify-digest", str(tmp_path)]) == 1
