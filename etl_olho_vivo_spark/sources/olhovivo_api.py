"""``olhovivo`` custom Spark data source — the REST API as a first-class scan.

The reference's stage 1 is a Lambda that polls the SPTrans *Olho Vivo*
``/Posicao`` endpoint and drops one JSON object per poll on S3
(``get-bus-data.py:56-59`` fetch, ``:26-49`` writer, cookie auth ``:11-24``).
SURVEY §2.1 S1 maps this to a Spark **Python data source** so the engine can
scan the API like any other table — batch (one input partition per poll →
task-parallel fetch on executors) or micro-batch streaming (one poll per
batch with replayable offsets):

    spark.dataSource.register(OlhoVivoDataSource)
    spark.read.format("olhovivo").option("polls", 4).load()          # batch
    spark.readStream.format("olhovivo").load()                       # stream

Rows come out in the RAW nested shape (``schemas.RAW_POSICAO_SCHEMA`` minus
the corrupt-record column — the source yields parsed documents, not text),
so ``io/flatten.py:flatten_posicoes`` applies unchanged downstream.

Fetch modes (``mode`` option):
- ``offline`` (default): a deterministic synthetic generator producing the
  exact ``{hr, l: [{c, cl, sl, lt0, lt1, qv, vs: [{p, a, ta, py, px}]}]}``
  shape — same integer-arithmetic style as ``sources/events_adapter.py``.
  No network; fully reproducible given (seed, t0): what tests and CI run.
- ``live``: the real authenticated poll (cookie session via
  ``POST /Login/Autenticar?token=…`` then ``GET /Posicao`` — reference
  ``get-bus-data.py:11-24,56-59``).  Requires the ``requests`` package and
  network access; the token comes from the ``api_token`` option (never
  hardcoded — SURVEY §2.1 S2).  Raises ``NotImplementedError`` with a clear
  message when ``requests`` is unavailable (this container has no network).

Scale note: one poll is one input partition, so a day of polls fans out
across executors; at 100 TB-of-history scale the raw zone is the landed
JSON (S3) and this source is only the *ingestion edge* — the landed zone
keeps Spark's native partition pruning.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from etl_olho_vivo_spark.schemas import RAW_POSICAO_SCHEMA

# The API document schema: RAW_POSICAO_SCHEMA minus the PERMISSIVE
# quarantine column (that column belongs to the *text* JSON zone reader).
API_SCHEMA = StructType(
    [f for f in RAW_POSICAO_SCHEMA.fields if f.name != "_corrupt_record"]
)

# Deterministic default epoch for offline mode (2024-01-01T00:00:00Z);
# override with the t0 option.
_DEFAULT_T0 = 1_704_067_200
_POLL_PERIOD_S = 30


def _iso(ts: int) -> str:
    return datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _fake_poll(poll: int, t0: int, n_lines: int, n_vehicles: int, seed: int):
    """One deterministic /Posicao document (the offline fetcher).

    Pure integer arithmetic on (poll, line, vehicle, seed) — stable across
    processes, partitions, and retries (a task retry re-fetches identical
    data, which a live HTTP poll cannot promise).
    """
    ts = t0 + poll * _POLL_PERIOD_S
    lines = []
    for li in range(n_lines):
        cl = seed * 100_000 + li
        vehicles = []
        for vi in range(n_vehicles):
            vid = cl * 100 + vi
            step = (poll * 997 + vi * 31 + li * 7) % 30000
            vehicles.append(
                (
                    vid,                                   # p
                    (vid % 10) < 7,                        # a
                    _iso(ts - (vi % _POLL_PERIOD_S)),      # ta
                    -23.8 + step * 1e-5,                   # py
                    -46.85 + ((step * 7919) % 30000) * 1e-5,  # px
                )
            )
        lines.append(
            (
                f"{1000 + li}-{10 + li % 90}",             # c
                cl,                                        # cl
                (li % 2) + 1,                              # sl
                f"DEST_{li}",                              # lt0
                f"ORIG_{li}",                              # lt1
                n_vehicles,                                # qv
                vehicles,                                  # vs
            )
        )
    return (_iso(ts)[11:16], lines)  # (hr "HH:MM", l)


def _live_poll(options: dict):
    """The real authenticated poll (reference get-bus-data.py:11-24,56-59)."""
    try:
        import requests  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "mode=live needs the 'requests' package and network access; "
            "this environment has neither. Use mode=offline (default) or "
            "land raw JSON and read it with io.flatten.read_raw_posicoes."
        ) from exc
    base = options.get(
        "base_url", "https://api.olhovivo.sptrans.com.br/v2.1"
    )
    token = options.get("api_token")
    if not token:
        raise ValueError("mode=live requires the api_token option")
    session = requests.Session()
    # explicit (connect, read) timeouts: requests has NO default timeout,
    # and a stalled endpoint would otherwise hang the task — or, in
    # streaming mode (where read() runs on the driver), the whole query
    timeout = (10, 30)
    auth = session.post(
        f"{base}/Login/Autenticar?token={token}", timeout=timeout
    )
    if auth.status_code != 200 or auth.text.strip() != "true":
        raise RuntimeError(f"olhovivo auth failed: HTTP {auth.status_code}")
    resp = session.get(f"{base}/Posicao", timeout=timeout)
    resp.raise_for_status()
    doc = resp.json()
    return (
        doc.get("hr"),
        [
            (
                line.get("c"), line.get("cl"), line.get("sl"),
                line.get("lt0"), line.get("lt1"), line.get("qv"),
                [
                    (v.get("p"), v.get("a"), v.get("ta"),
                     v.get("py"), v.get("px"))
                    for v in line.get("vs") or []
                ],
            )
            for line in doc.get("l") or []
        ],
    )


class _PollPartition(InputPartition):
    def __init__(self, poll: int):
        self.poll = poll


def _int_opt(options: dict, key: str, default: int) -> int:
    return int(options.get(key, default))


class OlhoVivoBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self):
        if self.options.get("mode", "offline") == "live":
            # live polls are one instant of ephemeral state: N parallel
            # partitions would mean N concurrent logins fetching the SAME
            # moment (near-duplicate pings masquerading as distinct
            # polls, different on every task retry).  One partition per
            # live read; cadence lives with the scheduler/stream.
            return [_PollPartition(0)]
        return [
            _PollPartition(i)
            for i in range(_int_opt(self.options, "polls", 1))
        ]

    def read(self, partition: _PollPartition):
        if self.options.get("mode", "offline") == "live":
            yield _live_poll(self.options)
            return
        yield _fake_poll(
            partition.poll,
            _int_opt(self.options, "t0", _DEFAULT_T0),
            _int_opt(self.options, "lines", 5),
            _int_opt(self.options, "vehicles", 8),
            _int_opt(self.options, "seed", 42),
        )


class OlhoVivoStreamReader(SimpleDataSourceStreamReader):
    """One poll per micro-batch; the offset is the poll counter, so a
    failed batch replays the identical (deterministic) document."""

    def __init__(self, options: dict):
        self.options = options

    def initialOffset(self):
        return {"poll": 0}

    def read(self, start: dict):
        poll = int(start["poll"])
        max_polls = _int_opt(self.options, "max_polls", 2**31)
        if poll >= max_polls:
            return iter([]), {"poll": poll}
        if self.options.get("mode", "offline") == "live":
            return iter([_live_poll(self.options)]), {"poll": poll + 1}
        row = _fake_poll(
            poll,
            _int_opt(self.options, "t0", _DEFAULT_T0),
            _int_opt(self.options, "lines", 5),
            _int_opt(self.options, "vehicles", 8),
            _int_opt(self.options, "seed", 42),
        )
        return iter([row]), {"poll": poll + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        if self.options.get("mode", "offline") == "live":
            # A live REST poll is ephemeral — the data for a past offset
            # no longer exists, so deterministic replay is IMPOSSIBLE.
            # Failing loudly beats silently fabricating positions; the
            # replayable log for live data is the raw landing zone
            # (write_raw_json via foreachBatch), not the API.
            raise RuntimeError(
                "mode=live cannot replay past offsets: the API serves "
                "only the current instant. Recover live streams from the "
                "raw JSON landing zone (io.sinks.write_raw_json + "
                "io.flatten.read_raw_posicoes) instead."
            )
        rows = []
        for poll in range(int(start["poll"]), int(end["poll"])):
            rows.append(
                _fake_poll(
                    poll,
                    _int_opt(self.options, "t0", _DEFAULT_T0),
                    _int_opt(self.options, "lines", 5),
                    _int_opt(self.options, "vehicles", 8),
                    _int_opt(self.options, "seed", 42),
                )
            )
        return iter(rows)


def register(spark) -> None:
    """Register the source, shipping this package to Python workers.

    The pickled DataSource class is resolved *by module path* inside
    Spark's Python runner processes, which do not share the driver's
    ``sys.path`` — exactly like executors on a real cluster.  Shipping the
    package as a zip via ``addPyFile`` is the programmatic equivalent of
    ``spark-submit --py-files`` and makes registration location-independent.
    """
    import os
    import shutil
    import tempfile

    import etl_olho_vivo_spark

    if not getattr(spark, "_olhovivo_pkg_shipped", False):
        import hashlib

        pkg_dir = os.path.dirname(os.path.abspath(etl_olho_vivo_spark.__file__))
        # deterministic per-package-location path (NOT a fresh mkdtemp per
        # session — those zips accumulated forever on long-lived hosts);
        # rebuilt on every register so code edits always ship fresh
        slot = os.path.join(
            tempfile.gettempdir(),
            "eov_pyfiles_" + hashlib.md5(pkg_dir.encode()).hexdigest()[:12],
        )
        os.makedirs(slot, exist_ok=True)
        zip_path = shutil.make_archive(
            os.path.join(slot, "etl_olho_vivo_spark_pkg"),
            "zip",
            root_dir=os.path.dirname(pkg_dir),
            base_dir="etl_olho_vivo_spark",
        )
        spark.sparkContext.addPyFile(zip_path)
        spark._olhovivo_pkg_shipped = True
    if not getattr(spark, "_olhovivo_registered", False):
        spark.dataSource.register(OlhoVivoDataSource)
        spark._olhovivo_registered = True


class OlhoVivoDataSource(DataSource):
    """``spark.read.format("olhovivo")`` / ``spark.readStream.format(...)``."""

    @classmethod
    def name(cls) -> str:
        return "olhovivo"

    def schema(self) -> StructType:
        return API_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return OlhoVivoBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return OlhoVivoStreamReader(self.options)
