"""OTLP metrics WIRE codec: protobuf ``ExportMetricsServiceRequest``
bytes → engine rows, the OpenTelemetry dual of :mod:`.prompb`.

The engine already ingests OTLP-SHAPED exponential-histogram rows
(``functions.native_hist.histograms_from_otlp``); this module parses the
actual OTLP/HTTP-protobuf POST body (PUBLIC opentelemetry-proto
``metrics/v1/metrics.proto``), so an OTel collector's ``otlphttp``
exporter can point straight at the engine.  Same hand-rolled
varint/length-delimited discipline as ``prompb`` (no generated stubs),
Arrow-batched ``mapInPandas`` seams, batch/streaming dual.

Decoded surfaces:

- gauge / sum number points → ``ROW_SCHEMA`` float samples;
- classic explicit-bounds histograms → the public OTLP→Prometheus
  lowering: cumulative ``<name>_bucket{le=...}`` series (incl. ``+Inf``)
  plus ``<name>_sum`` / ``<name>_count`` — the shape the engine's
  classic ``histogram_quantile`` already consumes;
- exponential histograms → the OTLP data-point struct rows
  ``histograms_from_otlp`` lowers to ``HIST_ROW_SCHEMA``.

Label model: resource attributes and data-point attributes merge into
one label map (point attributes win on collision); non-string attribute
values stringify (bool → ``true``/``false``, numbers via ``str``,
nested array/kvlist via a compact repr) — the flattening every
OTLP→Prometheus bridge performs.  Timestamps are ``time_unix_nano``
floored to engine seconds.

Wire notes (metrics.proto v1, all public): ``time_unix_nano``/``count``/
``zero_count``/``bucket_counts`` are FIXED64 (8 raw little-endian
bytes; packed for the repeated form), ``explicit_bounds`` packed
doubles, ``scale``/bucket ``offset`` are zigzag sint32, exponential
bucket counts are packed uint64 varints.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame

from .prompb import _enc_uvarint, _msg, _unzigzag, _uvarint

#: Engine row schema for the number-point / classic-histogram lowering.
OTLP_ROW_SCHEMA = ("metric string, labels map<string,string>, ts bigint, "
                   "value double")

#: The OTLP exponential data-point shape histograms_from_otlp consumes.
OTLP_EXPHIST_SCHEMA = (
    "metric string, labels map<string,string>, ts bigint, count bigint, "
    "sum double, zero_count bigint, zero_threshold double, scale int, "
    "pos_offset int, pos_counts array<bigint>, "
    "neg_offset int, neg_counts array<bigint>"
)


def _ofields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Like ``prompb._fields`` but FIXED64 yields the raw 8 bytes —
    OTLP uses fixed64 for both uint64 counters and double sums, so the
    caller picks the unpack."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _uvarint(buf, i)
        field, wt = key >> 3, key & 0x07
        if wt == 0:
            v, i = _uvarint(buf, i)
            yield field, wt, v
        elif wt == 1:
            yield field, wt, buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _uvarint(buf, i)
            yield field, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield field, wt, buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _f64_u(raw: bytes) -> int:
    return struct.unpack("<Q", raw)[0]


def _f64_d(raw: bytes) -> float:
    return struct.unpack("<d", raw)[0]


def _any_value(buf: bytes) -> str:
    """AnyValue → the flattened string every OTLP→Prometheus bridge
    emits for label use."""
    for f, wt, v in _ofields(buf):
        if f == 1 and wt == 2:
            return v.decode("utf-8")
        if f == 2 and wt == 0:
            return "true" if v else "false"
        if f == 3 and wt == 0:
            u = v if v < (1 << 63) else v - (1 << 64)
            return str(u)
        if f == 4 and wt == 1:
            return str(_f64_d(v))
        if f == 5 and wt == 2:  # ArrayValue{values=1}
            return "[" + ",".join(
                _any_value(x) for g, w, x in _ofields(v)
                if g == 1 and w == 2) + "]"
        if f == 6 and wt == 2:  # KeyValueList{values=1}
            return "{" + ",".join(
                "%s=%s" % _key_value(x) for g, w, x in _ofields(v)
                if g == 1 and w == 2) + "}"
        if f == 7 and wt == 2:
            return v.hex()
    return ""


def _key_value(buf: bytes) -> tuple[str, str]:
    key, val = "", ""
    for f, wt, v in _ofields(buf):
        if f == 1 and wt == 2:
            key = v.decode("utf-8")
        elif f == 2 and wt == 2:
            val = _any_value(v)
    return key, val


def _attrs(buf: bytes, field: int) -> dict:
    return dict(_key_value(v) for f, wt, v in _ofields(buf)
                if f == field and wt == 2)


def _number_point(buf: bytes) -> dict:
    out = {"attrs": {}, "ts": 0, "value": None}
    for f, wt, v in _ofields(buf):
        if f == 7 and wt == 2:
            out["attrs"].update([_key_value(v)])
        elif f == 3 and wt == 1:
            out["ts"] = _f64_u(v) // 1_000_000_000
        elif f == 4 and wt == 1:
            out["value"] = _f64_d(v)
        elif f == 6 and wt == 1:
            u = _f64_u(v)
            out["value"] = float(u if u < (1 << 63) else u - (1 << 64))
    return out


def _hist_point(buf: bytes) -> dict:
    out = {"attrs": {}, "ts": 0, "count": 0, "sum": None,
           "bucket_counts": [], "bounds": []}
    for f, wt, v in _ofields(buf):
        if f == 9 and wt == 2:
            out["attrs"].update([_key_value(v)])
        elif f == 3 and wt == 1:
            out["ts"] = _f64_u(v) // 1_000_000_000
        elif f == 4 and wt == 1:
            out["count"] = _f64_u(v)
        elif f == 5 and wt == 1:
            out["sum"] = _f64_d(v)
        elif f == 6:  # packed fixed64 bucket counts
            if wt == 2:
                out["bucket_counts"].extend(
                    struct.unpack(f"<{len(v) // 8}Q", v))
            else:
                out["bucket_counts"].append(_f64_u(v))
        elif f == 7:  # packed double bounds
            if wt == 2:
                out["bounds"].extend(struct.unpack(f"<{len(v) // 8}d", v))
            else:
                out["bounds"].append(_f64_d(v))
    return out


def _exp_buckets(buf: bytes) -> tuple[int, list[int]]:
    offset, counts = 0, []
    for f, wt, v in _ofields(buf):
        if f == 1 and wt == 0:
            offset = _unzigzag(v)
        elif f == 2:
            if wt == 2:
                i = 0
                while i < len(v):
                    u, i = _uvarint(v, i)
                    counts.append(u)
            else:
                counts.append(v)
    return offset, counts


def _exphist_point(buf: bytes) -> dict:
    out = {"attrs": {}, "ts": 0, "count": 0, "sum": 0.0, "scale": 0,
           "zero_count": 0, "zero_threshold": 0.0,
           "pos_offset": 0, "pos_counts": [],
           "neg_offset": 0, "neg_counts": []}
    for f, wt, v in _ofields(buf):
        if f == 1 and wt == 2:
            out["attrs"].update([_key_value(v)])
        elif f == 3 and wt == 1:
            out["ts"] = _f64_u(v) // 1_000_000_000
        elif f == 4 and wt == 1:
            out["count"] = _f64_u(v)
        elif f == 5 and wt == 1:
            out["sum"] = _f64_d(v)
        elif f == 6 and wt == 0:
            out["scale"] = _unzigzag(v)
        elif f == 7 and wt == 1:
            out["zero_count"] = _f64_u(v)
        elif f == 8 and wt == 2:
            out["pos_offset"], out["pos_counts"] = _exp_buckets(v)
        elif f == 9 and wt == 2:
            out["neg_offset"], out["neg_counts"] = _exp_buckets(v)
        elif f == 14 and wt == 1:
            out["zero_threshold"] = _f64_d(v)
    return out


def decode_export_request(data: bytes) -> list[dict]:
    """Uncompressed ``ExportMetricsServiceRequest`` → flat data-point
    dicts: ``{"kind": "number"|"histogram"|"exphist", "metric": name,
    "labels": {...}, ...point fields}`` with resource attributes merged
    (point attributes win)."""
    points: list[dict] = []
    for f, wt, rm in _ofields(data):
        if f != 1 or wt != 2:
            continue
        res_attrs: dict = {}
        metrics: list[bytes] = []
        for f2, wt2, v2 in _ofields(rm):
            if f2 == 1 and wt2 == 2:  # Resource
                res_attrs = _attrs(v2, 1)
            elif f2 == 2 and wt2 == 2:  # ScopeMetrics
                metrics.extend(v3 for f3, wt3, v3 in _ofields(v2)
                               if f3 == 2 and wt3 == 2)
        for m in metrics:
            name, kinds = "", []
            for f3, wt3, v3 in _ofields(m):
                if f3 == 1 and wt3 == 2:
                    name = v3.decode("utf-8")
                elif f3 in (5, 7) and wt3 == 2:  # Gauge / Sum
                    kinds.append(("number", v3))
                elif f3 == 9 and wt3 == 2:  # Histogram
                    kinds.append(("histogram", v3))
                elif f3 == 10 and wt3 == 2:  # ExponentialHistogram
                    kinds.append(("exphist", v3))
            for kind, body in kinds:
                dec = {"number": _number_point, "histogram": _hist_point,
                       "exphist": _exphist_point}[kind]
                for f4, wt4, dp in _ofields(body):
                    if f4 != 1 or wt4 != 2:  # data_points
                        continue
                    p = dec(dp)
                    labels = dict(res_attrs)
                    labels.update(p.pop("attrs"))
                    points.append({"kind": kind, "metric": name,
                                   "labels": labels, **p})
    return points


# ------------------------------------------------------ DataFrame seams


def rows_from_otlp(df: DataFrame, bytes_col: str = "payload",
                   on_error: str = "drop") -> DataFrame:
    """BINARY OTLP POST bodies → ``ROW_SCHEMA`` float samples: gauge/sum
    points verbatim, classic explicit-bounds histograms lowered to the
    public Prometheus mapping (cumulative ``_bucket{le}`` incl. ``+Inf``,
    ``_sum``, ``_count``).  Arrow-batched mapInPandas, drop-or-raise
    error contract like ``prompb.timeseries_from_prompb``."""
    if on_error not in ("drop", "raise"):
        raise ValueError("on_error must be 'drop' or 'raise'")

    def batches(it):
        import pandas as pd

        cols = ["metric", "labels", "ts", "value"]
        for pdf in it:
            rows = []
            for payload in pdf[bytes_col]:
                if payload is None:
                    continue
                try:
                    pts = decode_export_request(bytes(payload))
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                for p in pts:
                    if p["kind"] == "number":
                        if p["value"] is not None:
                            rows.append({"metric": p["metric"],
                                         "labels": p["labels"],
                                         "ts": p["ts"],
                                         "value": p["value"]})
                    elif p["kind"] == "histogram":
                        cum = 0
                        for b, c in zip(p["bounds"], p["bucket_counts"]):
                            cum += c
                            rows.append({
                                "metric": p["metric"] + "_bucket",
                                "labels": {**p["labels"], "le": str(b)},
                                "ts": p["ts"], "value": float(cum)})
                        rows.append({
                            "metric": p["metric"] + "_bucket",
                            "labels": {**p["labels"], "le": "+Inf"},
                            "ts": p["ts"], "value": float(p["count"])})
                        if p["sum"] is not None:
                            rows.append({"metric": p["metric"] + "_sum",
                                         "labels": p["labels"],
                                         "ts": p["ts"],
                                         "value": float(p["sum"])})
                        rows.append({"metric": p["metric"] + "_count",
                                     "labels": p["labels"], "ts": p["ts"],
                                     "value": float(p["count"])})
            yield pd.DataFrame(rows, columns=cols)

    return df.select(bytes_col).mapInPandas(batches, OTLP_ROW_SCHEMA)


def exphist_from_otlp(df: DataFrame, bytes_col: str = "payload",
                      on_error: str = "drop") -> DataFrame:
    """BINARY OTLP POST bodies → exponential-histogram data-point rows
    (``OTLP_EXPHIST_SCHEMA``) ready for
    ``native_hist.histograms_from_otlp`` → ``TSDB.insert_histograms`` —
    the native-histogram leg of the OTLP ingress."""
    if on_error not in ("drop", "raise"):
        raise ValueError("on_error must be 'drop' or 'raise'")

    keys = ("metric", "labels", "ts", "count", "sum", "zero_count",
            "zero_threshold", "scale", "pos_offset", "pos_counts",
            "neg_offset", "neg_counts")

    def batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for payload in pdf[bytes_col]:
                if payload is None:
                    continue
                try:
                    pts = decode_export_request(bytes(payload))
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                for p in pts:
                    if p["kind"] != "exphist":
                        continue
                    rows.append({k: p[k] for k in keys if k in p}
                                | {"metric": p["metric"],
                                   "labels": p["labels"]})
            yield pd.DataFrame(rows, columns=list(keys))

    return df.select(bytes_col).mapInPandas(batches, OTLP_EXPHIST_SCHEMA)


# ----------------------------------------------- encode side (tests/clients)


def _enc_any_string(s: str) -> bytes:
    return _msg(1, s.encode("utf-8"))


def _enc_kv(k: str, v: str) -> bytes:
    return _msg(1, k.encode("utf-8")) + _msg(2, _enc_any_string(v))


def _enc_f64u(field: int, v: int) -> bytes:
    return _enc_uvarint(field << 3 | 1) + struct.pack("<Q", v)


def _enc_f64d(field: int, v: float) -> bytes:
    return _enc_uvarint(field << 3 | 1) + struct.pack("<d", float(v))


def encode_export_request(points: list[dict]) -> bytes:
    """Flat point dicts (the :func:`decode_export_request` shape, with
    ``resource`` labels folded into ``labels``) → one wire
    ``ExportMetricsServiceRequest`` — the client/test side.  Each point
    becomes its own metric entry; gauge for numbers."""
    metrics = bytearray()
    for p in points:
        attrs_field = {"number": 7, "histogram": 9, "exphist": 1}[p["kind"]]
        dp = bytearray()
        dp += _enc_f64u(3, int(p["ts"]) * 1_000_000_000)
        for k, v in sorted(p.get("labels", {}).items()):
            dp += _msg(attrs_field, _enc_kv(k, str(v)))
        if p["kind"] == "number":
            dp += _enc_f64d(4, p["value"])
            body = _msg(1, bytes(dp))
            metric = _msg(1, p["metric"].encode()) + _msg(5, body)
        elif p["kind"] == "histogram":
            dp += _enc_f64u(4, int(p["count"]))
            if p.get("sum") is not None:
                dp += _enc_f64d(5, p["sum"])
            bc = p.get("bucket_counts") or []
            dp += _msg(6, struct.pack(f"<{len(bc)}Q", *map(int, bc)))
            bounds = p.get("bounds") or []
            dp += _msg(7, struct.pack(f"<{len(bounds)}d",
                                      *map(float, bounds)))
            body = _msg(1, bytes(dp))
            metric = _msg(1, p["metric"].encode()) + _msg(9, body)
        else:
            dp += _enc_f64u(4, int(p["count"]))
            dp += _enc_f64d(5, p.get("sum") or 0.0)
            sc = int(p.get("scale") or 0)
            dp += _enc_uvarint(6 << 3 | 0) + _enc_uvarint(
                (sc << 1) ^ (sc >> 63))
            dp += _enc_f64u(7, int(p.get("zero_count") or 0))

            def side(off: int, counts: list[int]) -> bytes:
                o = int(off)
                b = (_enc_uvarint(1 << 3 | 0)
                     + _enc_uvarint((o << 1) ^ (o >> 63)))
                b += _msg(2, b"".join(_enc_uvarint(int(c)) for c in counts))
                return b

            dp += _msg(8, side(p.get("pos_offset") or 0,
                               p.get("pos_counts") or []))
            dp += _msg(9, side(p.get("neg_offset") or 0,
                               p.get("neg_counts") or []))
            if p.get("zero_threshold"):
                dp += _enc_f64d(14, p["zero_threshold"])
            body = _msg(1, bytes(dp))
            metric = _msg(1, p["metric"].encode()) + _msg(10, body)
        metrics += _msg(2, metric)
    scope_metrics = bytes(metrics)
    resource_metrics = _msg(2, scope_metrics)
    return _msg(1, resource_metrics)
