"""Unit tests for the predicate filters — the reference's riskiest,
untested logic (SURVEY.md §5): OR-over-alt ids, NULL-wrapper => drop,
case-insensitive serverName, parseInt coercion, 960 clamp."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from kinesis_stream_reader_spark.operators.filters import (
    agent_id_predicate,
    clamp_duration,
    contact_id_predicate,
    filter_records,
    parse_int_param,
    server_name_predicate,
    tenant_id_predicate,
)
from kinesis_stream_reader_spark.schema import EVENT_SCHEMA


def _contact_row(seq, contact=None, alt=None, server="s1", tenant=None):
    return Row(
        event_time=None,
        partition_key="pk",
        sequence_number=seq,
        tenantId=Row(
            tenantId=Row(long=tenant) if tenant is not None else None,
            tenantIdAlt=None,
            serverName=Row(string=server),
        ),
        baseEventData=Row(
            **{
                "com.incontact.datainfra.events.ContactEvent": Row(
                    mediaScopeIdentification=Row(
                        contactIdentification=Row(
                            contactId=Row(long=contact) if contact is not None else None,
                            contactIdAlt=Row(long=alt) if alt is not None else None,
                        )
                    )
                ),
                "com.incontact.datainfra.events.AgentEvent": None,
            }
        ),
    )


@pytest.fixture(scope="module")
def contact_df(spark):
    rows = [
        _contact_row(1, contact=7),            # primary match
        _contact_row(2, alt=7),                # alt match
        _contact_row(3, contact=7, alt=7),     # both
        _contact_row(4, contact=8, alt=9),     # neither
        _contact_row(5),                       # NULL wrappers -> drop
    ]
    # a row with the whole ContactEvent branch NULL (AgentEvent-only shape)
    rows.append(
        Row(
            event_time=None,
            partition_key="pk",
            sequence_number=6,
            tenantId=Row(tenantId=None, tenantIdAlt=None, serverName=Row(string="S1")),
            baseEventData=Row(
                **{
                    "com.incontact.datainfra.events.ContactEvent": None,
                    "com.incontact.datainfra.events.AgentEvent": None,
                }
            ),
        )
    )
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def seqs(df):
    return sorted(r.sequence_number for r in df.collect())


def test_or_over_alt_ids(contact_df):
    # objectFilter/index.js:15-16 — primary OR alternate matches
    assert seqs(contact_df.filter(contact_id_predicate("7"))) == [1, 2, 3]


def test_null_wrapper_and_missing_branch_drop(contact_df):
    # catch->false (objectFilter/index.js:17-19): rows 5 (NULL wrappers)
    # and 6 (branch NULL) never match any value
    assert seqs(contact_df.filter(contact_id_predicate("0"))) == []


def test_parseint_prefix_coercion(contact_df):
    # parseInt('7abc') == 7
    assert seqs(contact_df.filter(contact_id_predicate("7abc"))) == [1, 2, 3]


def test_nan_matches_nothing(contact_df):
    assert seqs(contact_df.filter(contact_id_predicate("abc"))) == []


def test_server_name_case_insensitive(contact_df):
    # objectFilter/index.js:37
    assert seqs(contact_df.filter(server_name_predicate("s1"))) == [1, 2, 3, 4, 5, 6]
    assert seqs(contact_df.filter(server_name_predicate("S1"))) == [1, 2, 3, 4, 5, 6]
    assert seqs(contact_df.filter(server_name_predicate("s2"))) == []


def test_tenant_null_wrapper_drops(contact_df):
    assert seqs(contact_df.filter(tenant_id_predicate("1"))) == []


def test_conjunction_applies_only_present_params(contact_df):
    out = filter_records(contact_df, {"contactId": "7", "serverName": "S1"})
    assert seqs(out) == [1, 2, 3]
    # no params -> identity (reference: no query params, all records pass)
    assert seqs(filter_records(contact_df, {})) == [1, 2, 3, 4, 5, 6]


def test_empty_string_param_disables_filter(contact_df):
    # JS truthiness gate (objectFilter/index.js:7): ?contactId= (empty)
    # means the filter is NOT applied — all records pass, not none
    assert seqs(filter_records(contact_df, {"contactId": ""})) == [1, 2, 3, 4, 5, 6]
    assert seqs(filter_records(contact_df, {"serverName": "", "contactId": "7"})) == [1, 2, 3]


def test_agent_filter_on_contact_rows_matches_nothing(contact_df):
    assert seqs(contact_df.filter(agent_id_predicate("7"))) == []


def test_parse_int_param():
    assert parse_int_param("12") == 12
    assert parse_int_param("12ab") == 12
    assert parse_int_param("-3") == -3
    assert parse_int_param("ab") is None
    assert parse_int_param("") is None
    assert parse_int_param("0x10") == 16  # radix-less parseInt hex
    assert parse_int_param("-0XFF") == -255
    assert parse_int_param("0xzz") is None
    assert parse_int_param("7.5") == 7


def test_clamp_duration():
    # app/server/index.js:28-34
    assert clamp_duration(None) == 10
    assert clamp_duration("50") == 50
    assert clamp_duration("99999") == 960
    assert clamp_duration("garbage") == 10
