"""parse-ext analogue tests (parse/ext/TestExtParser.java model: drive the
extension point with a coreutils wrapper script — `cat` and `md5sum`
dispatched on the mimeType argument, exactly like the plugin's shipped
`command` fixture which requires $1 to be the content type)."""

import hashlib
import os
import stat

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.extparse import (
    FAILED, FAILED_TRUNCATED, SUCCESS, ExtCommand, run_ext_parse,
)

# the reference's command fixture (parse-ext/command), trimmed: dispatch on
# the appended mimeType, unknown type -> non-zero exit
WRAPPER = """#!/bin/bash
set -e
if [ $# -ne 1 ]; then echo Usage:$0 mimeType >&2; exit 1; fi
case $1 in
"application/vnd.nutch.example.cat") cat ;;
"application/vnd.nutch.example.md5sum") md5sum ;;
"text/x-upper") tr a-z A-Z ;;
"text/x-sed") sed s/red/blue/ ;;
*) echo "can not handle mimeType $1" >&2; exit 1 ;;
esac
"""


@pytest.fixture(scope="module")
def wrapper(tmp_path_factory):
    p = tmp_path_factory.mktemp("extcmd") / "command"
    p.write_text(WRAPPER)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def _rules(wrapper, **kw):
    types = ("application/vnd.nutch.example.cat",
             "application/vnd.nutch.example.md5sum",
             "text/x-upper", "text/x-sed")
    return {t: ExtCommand(wrapper, **kw) for t in types}


def _content_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, content binary, content_type string, content_length long")


def test_cat_and_md5sum_alternately(spark, wrapper):
    """TestExtParser.java:111-124: the same content through 'cat' (text is
    the content) and 'md5sum' (text starts with the hex digest)."""
    body = b"nutch rocks nutch rocks nutch rocks"
    df = _content_df(spark, [
        ("u-cat", body, "application/vnd.nutch.example.cat", len(body)),
        ("u-md5", body, "application/vnd.nutch.example.md5sum", len(body)),
    ])
    got = {r.url: r for r in run_ext_parse(df, _rules(wrapper)).collect()}
    assert got["u-cat"].status == SUCCESS
    assert got["u-cat"].text == body.decode()
    assert got["u-md5"].status == SUCCESS
    assert got["u-md5"].text.split()[0] == hashlib.md5(body).hexdigest()


def test_outlinks_extracted_from_command_stdout(spark, wrapper):
    body = b"hello see http://ext.example.com/a?x=1 and ftp://f.example.org/p"
    df = _content_df(spark, [
        ("u1", body, "application/vnd.nutch.example.cat", len(body))])
    r = run_ext_parse(df, _rules(wrapper)).collect()[0]
    assert r.error is None
    assert r.outlinks == ["http://ext.example.com/a?x=1", "ftp://f.example.org/p"]


def test_transforming_commands(spark, wrapper):
    df = _content_df(spark, [
        ("u1", b"red fish", "text/x-sed", 8),
        ("u2", b"shout", "text/x-upper", 5),
    ])
    got = {r.url: r for r in run_ext_parse(df, _rules(wrapper)).collect()}
    assert got["u1"].text == "blue fish"
    assert got["u2"].text == "SHOUT"


def test_no_rule_for_content_type_fails(spark, wrapper):
    """ExtParser.java:76-78: missing extension -> FAILED with the exact
    message shape (the command never runs)."""
    df = _content_df(spark, [("u1", b"x", "application/x-unknown", 1)])
    r = run_ext_parse(df, _rules(wrapper)).collect()[0]
    assert r.status == FAILED and r.text is None
    assert "No external command defined for contentType: application/x-unknown" in r.error


def test_declared_length_mismatch_is_truncated(spark, wrapper):
    """ExtParser.java:94-101: raw length != declared Content-Length ->
    FAILED_TRUNCATED, the command never runs."""
    df = _content_df(spark, [
        ("u1", b"abc", "application/vnd.nutch.example.cat", 99)])
    r = run_ext_parse(df, _rules(wrapper)).collect()[0]
    assert r.status == FAILED_TRUNCATED
    assert "Content truncated at 3 bytes" in r.error


def test_nonzero_exit_surfaces_stderr(spark, wrapper):
    """A type the wrapper rejects: non-zero exit -> FAILED carrying the
    command's stderr (ExtParser.java:116-120)."""
    rules = {"text/x-bad": ExtCommand(wrapper)}
    df = _content_df(spark, [("u1", b"x", "text/x-bad", 1)])
    r = run_ext_parse(df, rules).collect()[0]
    assert r.status == FAILED and "can not handle mimeType text/x-bad" in r.error


def test_timeout_kills_command(spark):
    rules = {"text/x-slow": ExtCommand("sh -c 'sleep 30'", timeout_s=1)}
    df = _content_df(spark, [("u1", b"x", "text/x-slow", 1)])
    r = run_ext_parse(df, rules).collect()[0]
    assert r.status == FAILED and "timed out after 1s" in r.error


def test_missing_length_column_skips_truncation_gate(spark, wrapper):
    df = spark.createDataFrame(
        [("u1", b"abc", "application/vnd.nutch.example.cat")],
        "url string, content binary, content_type string")
    r = run_ext_parse(df, _rules(wrapper)).collect()[0]
    assert r.status == SUCCESS and r.text == "abc"
