"""Round-3 regression tests: the four ADVICE findings (null-id dedup
groups, degenerate-vector centroid assignment, bracket escaping in Access
extraction, missing-cleaning-metadata availability), the semi-join dedup
strategy, missing-dependency error naming, and the rar external-tool seam."""

import os
import stat
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.functions.dedup import exact_dedup  # noqa: E402
from hbsir_old_spark.functions.similarity import assign_nearest_centroids  # noqa: E402
from hbsir_old_spark.plans.registry import TableRegistry  # noqa: E402
from hbsir_old_spark.sources import acquire  # noqa: E402
from hbsir_old_spark.sources.acquire import (  # noqa: E402
    extract_access_tables,
    extract_archive,
)


# -- ADVICE 1: exact_dedup null-id groups --------------------------------
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_all_null_id_group_dropped(spark):
    # the pre-min_by window formulation dropped groups whose ids are all
    # NULL; min_by alone would emit one all-null row for them
    df = _docs(spark, [(None, "dup text"), (None, "dup text"), (1, "other")])
    out = exact_dedup(df).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 1


def test_exact_dedup_mixed_null_ids_keep_min_non_null(spark):
    df = _docs(spark, [(None, "dup text"), (7, "dup text"), (3, "dup text")])
    out = exact_dedup(df).collect()
    assert [r["doc_id"] for r in out] == [3]


@pytest.mark.parametrize("keep", ["min", "max"])
def test_exact_dedup_semi_strategy_matches_agg(spark, keep):
    df = _docs(
        spark,
        [(5, "aaa"), (2, "aaa"), (9, "bbb"), (1, "bbb"), (4, "ccc"), (None, "aaa")],
    )
    agg = sorted(exact_dedup(df, keep=keep, strategy="agg").collect())
    semi = sorted(exact_dedup(df, keep=keep, strategy="semi").collect())
    assert agg == semi
    expected = {2, 1, 4} if keep == "min" else {5, 9, 4}
    assert {r["doc_id"] for r in agg} == expected


def test_exact_dedup_rejects_unknown_strategy(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="strategy"):
        exact_dedup(df, strategy="window")


# -- ADVICE 2: degenerate vectors in centroid assignment -----------------
def _centroid_arr(spark, cents):
    return (
        spark.createDataFrame(
            cents, "__centroid__ long, __centvec__ array<double>"
        )
        .agg(
            F.collect_list(F.struct("__centroid__", "__centvec__")).alias("__cents__")
        )
    )


def test_broken_centroid_never_wins_for_well_formed_row(spark):
    # centroid 1 is a zero vector (cosine = 0/0 = NaN); centroid 2 is
    # aligned with the row. Unguarded, NaN/NULL similarity could sort first.
    cents = _centroid_arr(spark, [(1, [0.0, 0.0]), (2, [1.0, 0.0])])
    row = spark.createDataFrame([(10, [0.9, 0.1])], "__cid__ long, __cvec__ array<double>")
    out = assign_nearest_centroids(row, "__cid__", "__cvec__", cents, keep=1).collect()
    assert out[0]["__centroid__"] == 2


def test_degenerate_row_vector_gets_deterministic_assignment(spark):
    # a zero row vector makes EVERY similarity NaN -> all coalesce to -inf
    # -> lowest centroid id wins by the tiebreak, deterministically
    cents = _centroid_arr(spark, [(4, [1.0, 0.0]), (2, [0.0, 1.0])])
    rows = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [None, 1.0])],
        "__cid__ long, __cvec__ array<double>",
    )
    out = {
        r["__cid__"]: r["__centroid__"]
        for r in assign_nearest_centroids(rows, "__cid__", "__cvec__", cents, keep=1).collect()
    }
    assert out == {10: 2, 11: 2}


# -- ADVICE 3: bracket escaping in Access table names --------------------
def test_access_table_name_closing_bracket_escaped(tmp_path):
    executed = []

    class Cursor:
        description = [("A",)]

        def tables(self):
            from types import SimpleNamespace

            return [SimpleNamespace(table_name="Evil]Name")]

        def execute(self, sql):
            executed.append(sql)
            return self

        def fetchall(self):
            return [(1,)]

    class Conn:
        def cursor(self):
            return Cursor()

        def close(self):
            pass

    written = extract_access_tables(
        "x.mdb", str(tmp_path), connect=lambda _: Conn()
    )
    assert executed == ["SELECT * FROM [Evil]]Name]"]
    assert written and written[0].endswith("Evil]Name.csv")


# -- ADVICE 4: missing cleaning metadata with both loaders ---------------
def _registry(spark, **kw):
    return TableRegistry(spark, **kw)


def test_missing_cleaning_metadata_is_unavailable_not_fatal(spark):
    # base loader is the cleaned source of record; raw coverage without
    # cleaning metadata must read as "unavailable year", not a KeyError
    raw = spark.createDataFrame([(1, "x")], "ADRS long, V string")
    reg = _registry(
        spark,
        schema={"derived": {"table_list": ["member"]}},
        base_loader=lambda name, year: None,
        raw_loader=lambda name, year: raw,
        cleaning_metadata={},
    )
    with pytest.raises(ValueError, match="unavailable"):
        reg.load_table("derived", [1400])


def test_missing_cleaning_metadata_raw_only_still_raises(spark):
    raw = spark.createDataFrame([(1, "x")], "ADRS long, V string")
    reg = _registry(
        spark,
        raw_loader=lambda name, year: raw,
        cleaning_metadata={},
    )
    with pytest.raises(KeyError, match="cleaning metadata"):
        reg.load_table("member", [1400], form="cleaned")


def test_raw_only_registry_prunes_tables_absent_from_raw_source(spark):
    # review finding: a raw-only registry must keep pruning members the raw
    # source simply doesn't carry (raw returns None), even when they also
    # have no cleaning metadata — only raw-data-present + no-metadata raises
    raw_a = spark.createDataFrame([(1400, 1, 2.0)], "Year int, ID long, V double")
    reg = _registry(
        spark,
        schema={"t": {"table_list": ["A", "B"]}},
        raw_loader=lambda name, year: raw_a if name == "A" else None,
        cleaning_metadata={
            "A": {"columns": {"Year": {}, "ID": {}, "V": {}}, "missings": "error"}
        },
    )
    assert reg.load_table("t", [1400]).count() == 1


def test_missing_dep_walk_survives_raising_loader(spark):
    # review finding: the diagnostic walk re-probes loaders on the error
    # path; a loader that raises there (e.g. non-idempotent, or raising
    # instead of returning None) must read as "not served" and never mask
    # the 'unavailable' ValueError with its own stack trace
    calls: set = set()

    def flaky_loader(name, year):
        if (name, year) in calls:
            raise FileNotFoundError(f"no path for {name}")
        calls.add((name, year))
        return None

    reg = _registry(
        spark,
        schema={"t": {"table_list": ["Ghost"]}},
        base_loader=flaky_loader,
    )
    with pytest.raises(ValueError, match="Ghost"):
        reg.load_table("t", [1400])


# -- missing-dependency error naming -------------------------------------
def test_adhoc_schema_error_names_missing_dependency(spark):
    reg = _registry(
        spark,
        schema={"my_adhoc": {"table_list": ["No_Such_Table"]}},
        base_loader=lambda name, year: None,
    )
    with pytest.raises(ValueError, match="No_Such_Table"):
        reg.load_table("my_adhoc", [1400])


def test_adhoc_schema_error_names_nested_missing_dependency(spark):
    reg = _registry(
        spark,
        schema={
            "outer": {"table_list": ["inner"]},
            "inner": {"table_list": ["Ghost_Base"]},
        },
        base_loader=lambda name, year: None,
    )
    with pytest.raises(ValueError, match="Ghost_Base"):
        reg.load_table("outer", [1400])


def test_available_member_not_reported_missing(spark):
    # one member resolves, so the table builds and no error fires
    base = spark.createDataFrame([(1400, 1, 2.0)], "Year int, ID long, V double")
    reg = _registry(
        spark,
        schema={"t": {"table_list": ["good", "absent"]}},
        base_loader=lambda name, year: base if name == "good" else None,
    )
    assert reg.load_table("t", [1400]).count() == 1


# -- rar external-tool seam ----------------------------------------------
def test_rar_without_tool_raises_with_guidance(tmp_path, monkeypatch):
    monkeypatch.setattr(acquire, "_find_unrar_tool", lambda: None)
    rar = tmp_path / "x.rar"
    rar.write_bytes(b"Rar!")
    with pytest.raises(NotImplementedError, match="7z|unrar"):
        extract_archive(str(rar), str(tmp_path / "o"))


def test_rar_extracts_via_detected_tool(tmp_path, monkeypatch):
    # a fake 7z on PATH proves detection + invocation + recursion plumbing
    # without a real rar codec in the sandbox
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    fake = bin_dir / "7z"
    fake.write_text(
        "#!/bin/sh\n"
        '# args: x -y -oDEST PATH\n'
        'dest="${3#-o}"\n'
        'mkdir -p "$dest"\n'
        'printf "ADRS\\n1\\n" > "$dest/U00.csv"\n'
    )
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    rar = tmp_path / "year.rar"
    rar.write_bytes(b"Rar!")
    out = extract_archive(str(rar), str(tmp_path / "out"))
    assert any(p.endswith("U00.csv") for p in out)


def test_rar_tool_failure_is_reported(tmp_path, monkeypatch):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    fake = bin_dir / "7z"
    fake.write_text("#!/bin/sh\necho boom >&2\nexit 2\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")
    rar = tmp_path / "bad.rar"
    rar.write_bytes(b"Rar!")
    with pytest.raises(RuntimeError, match="boom"):
        extract_archive(str(rar), str(tmp_path / "o"))
