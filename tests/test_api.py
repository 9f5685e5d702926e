"""API contract tests mirroring the reference's error-surface tests
(app/server/test/index.js:53-80)."""

from __future__ import annotations

from kinesis_stream_reader_spark.api import QueryParamValidator, error_envelope


def test_valid_params():
    v = QueryParamValidator().validate_params({"streamname": "s", "duration": "10"})
    assert v.to_dict() == {
        "badRequest": False,
        "missingRequiredParams": [],
        "invalidParams": [],
    }


def test_missing_required_param():
    # test/index.js:65-80 — missing streamname -> badRequest with typed body
    v = QueryParamValidator().validate_params({"duration": "10"})
    assert v.badRequest
    assert v.missingRequiredParams == ["streamname"]
    assert v.invalidParams == []


def test_invalid_param():
    v = QueryParamValidator().validate_params({"streamname": "s", "bogus": "1"})
    assert v.badRequest
    assert v.invalidParams == ["bogus"]


def test_all_reference_params_allowed():
    # app/server/index.js:46-48
    q = {
        "streamname": "s",
        "duration": "1",
        "contactId": "1",
        "agentId": "1",
        "serverName": "x",
        "tenantId": "1",
        "agentShiftId": "1",
    }
    assert not QueryParamValidator().validate_params(q).badRequest


def test_error_envelope():
    # app/server/index.js:66-69
    assert error_envelope("boom") == {"badRequest": True, "error": "boom"}


def test_registry_contract_integrity():
    """EVERY registered query ships with a DuckDB oracle — the round-2
    closure of the rows-only set (sketch bounds became driver-checked
    tolerance contracts, ann_lsh got md5-derived planes, and
    pagerank_converged a recursive-CTE mirror of the full loop)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) == set(qs)
    assert len(qs) >= 190


def test_sql_parameterized_injection_safe(spark, sf_dir):
    """A hostile parameter value binds as a literal — it can never
    widen the result set the way string concatenation would."""
    from kinesis_stream_reader_spark.sources.tables import load_events

    load_events(spark, sf_dir).createOrReplaceTempView("ksr_events_param")
    hostile = "click' OR '1'='1"
    out = spark.sql(
        "SELECT COUNT(*) AS n FROM ksr_events_param WHERE event_type = :t",
        args={"t": hostile},
    ).collect()[0]
    assert out.n == 0  # no event_type equals the hostile STRING
    legit = spark.sql(
        "SELECT COUNT(*) AS n FROM ksr_events_param WHERE event_type = :t",
        args={"t": "click"},
    ).collect()[0]
    assert legit.n > 0
