"""Charset support in the log readers (readfile/encoding/encoding.go)."""

import pytest

from beats_ray.sources.readers import resolve_encoding


def test_encoding_name_map():
    assert resolve_encoding("") == "utf-8"
    assert resolve_encoding("plain") == "latin-1"
    assert resolve_encoding("iso8859-1") == "iso8859-1"
    assert resolve_encoding("windows1252") == "cp1252"
    assert resolve_encoding("UTF-16LE") == "utf-16-le"
    with pytest.raises(ValueError):
        resolve_encoding("no-such-charset")


def _read(ray_session, tmp_path, raw: bytes, encoding: str, name="f.log"):
    from beats_ray.sources.readers import read_log_records
    p = tmp_path / name
    p.write_bytes(raw)
    out = read_log_records([str(p)], encoding=encoding).to_pandas()
    return out.sort_values("log_offset")["message"].tolist()


def test_latin1_golden(ray_session, tmp_path):
    raw = "caf\xe9 line\nn\xb0 2\n".encode("latin-1")
    assert _read(ray_session, tmp_path, raw, "iso8859-1") == \
        ["caf\xe9 line", "n\xb0 2"]


def test_utf16le_with_bom(ray_session, tmp_path):
    raw = "﻿hello\nw\xf6rld\n".encode("utf-16-le")
    assert _read(ray_session, tmp_path, raw, "utf-16le") == \
        ["hello", "wörld"]


def test_utf16_bom_autodetect_be(ray_session, tmp_path):
    raw = "alpha\nbeta\n".encode("utf-16")  # BOM + native order
    assert _read(ray_session, tmp_path, raw, "utf-16-bom") == ["alpha", "beta"]


def test_crlf_stripped(ray_session, tmp_path):
    raw = b"line one\r\nline two\r\n"
    assert _read(ray_session, tmp_path, raw, "plain") == ["line one", "line two"]


def test_utf8_bom_stripped(ray_session, tmp_path):
    raw = b"\xef\xbb\xbffirst\nsecond\n"
    assert _read(ray_session, tmp_path, raw, "utf-8") == ["first", "second"]
