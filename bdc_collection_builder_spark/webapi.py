"""HTTP surface — the reference's Flask blueprint re-expressed as a
dependency-free WSGI app over :class:`CollectionBuilderEngine`.

Route-for-route parity with the reference (views.py:30-231):

| method | path                                       | reference        |
|--------|--------------------------------------------|------------------|
| GET    | /api/activities                            | views.py:33-49   |
| POST   | /api/radcor                                | views.py:52-79   |
| GET/POST | /api/radcor/restart                      | views.py:110-128 |
| GET    | /api/stats/active                          | views.py:131-134 |
| GET    | /api/stats/pending                         | views.py:137-140 |
| GET    | /api/utils/collections-available           | views.py:143-148 |
| GET    | /api/utils/count-activities                | views.py:151-157 |
| GET    | /api/utils/count-activities-date           | views.py:160-166 |
| GET    | /api/utils/count-unsuccessfully-activities | views.py:169-173 |
| POST   | /api/check-scenes                          | views.py:176-192 |
| GET    | /api/collections                           | views.py:195-200 |
| GET    | /api/collections/<id>/tiles                | views.py:203-208 |
| GET    | /api/grids[/<id>]                          | views.py:211-222 |
| GET    | /api/providers                             | views.py:225-230 |

Design notes for the 100 TB deployment:

- The ONLY driver-side materialization in the app is the per-request
  ``collect()`` at the JSON boundary — every endpoint is either
  paginated (``/activities``), a bounded aggregate (counts,
  histograms), or a dimension scan (collections, providers, grids),
  so response sizes are bounded by construction regardless of the
  underlying table size. The heavy lifting stays in Spark plans.
- No Flask/werkzeug dependency: plain WSGI (PEP 3333) + stdlib
  ``wsgiref`` server, so the app runs anywhere the engine does and is
  testable by invoking the callable directly with an environ dict.
- The GET /api/radcor/restart 4 KiB query-string cap (views.py:122-124)
  is preserved, including the 414 response steering callers to POST.
"""

from __future__ import annotations

import base64
import datetime as dt
import decimal
import json
import re
from collections.abc import Callable, Iterable
from typing import Any
from urllib.parse import parse_qsl

from pyspark.sql import DataFrame

from bdc_collection_builder_spark.engine import CollectionBuilderEngine
from bdc_collection_builder_spark.pipeline.radcor import RadcorQuery

_MAX_GET_QUERY = 4096  # views.py:122-124 — GET restart query cap


def _json_default(o: Any) -> Any:
    if isinstance(o, (dt.datetime, dt.date)):
        return o.isoformat()
    if isinstance(o, decimal.Decimal):
        return float(o)
    if isinstance(o, (bytes, bytearray)):
        return base64.b64encode(bytes(o)).decode("ascii")
    raise TypeError(f"not JSON-serializable: {type(o)!r}")


def rows(df: DataFrame) -> list[dict[str, Any]]:
    """DataFrame → list of plain dicts (the JSON transport boundary)."""
    return [r.asDict(recursive=True) for r in df.collect()]


class HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


_STATUS_TEXT = {
    200: "200 OK",
    400: "400 Bad Request",
    404: "404 Not Found",
    405: "405 Method Not Allowed",
    414: "414 Request-URI Too Large",
    500: "500 Internal Server Error",
}


def _parse_bool(v: str | bool | None) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "on")


def _radcor_query(args: dict[str, Any]) -> RadcorQuery:
    """SearchImageForm semantics (forms.py:129-196): w/s/e/n corners OR
    a scene list OR a tile list, plus satsen + date range + cloud."""
    bbox = None
    if all(k in args for k in ("w", "s", "e", "n")):
        bbox = (float(args["w"]), float(args["s"]),
                float(args["e"]), float(args["n"]))
    scenes = args.get("scenes")
    tiles = args.get("tiles")
    if isinstance(scenes, str):
        scenes = scenes.split(",")
    if isinstance(tiles, str):
        tiles = tiles.split(",")
    try:
        return RadcorQuery(
            collection_id=int(args.get("collection_id", 0) or 0),
            dataset=str(args.get("satsen", args.get("dataset", ""))),
            start_date=str(args.get("start", args.get("start_date", ""))),
            end_date=str(args.get("end", args.get("end_date", ""))),
            cloud=float(args.get("cloud", 100.0)),
            bbox=bbox, scenes=scenes, tiles=tiles,
            force=_parse_bool(args.get("force", False)),
            tags=args.get("tags") or [],
        )
    except (TypeError, ValueError) as exc:
        raise HttpError(400, str(exc)) from exc


class WebApi:
    """WSGI callable exposing the engine. Instantiate and hand to any
    PEP 3333 server (``wsgiref``, gunicorn, …) or call directly in
    tests with an environ dict."""

    def __init__(self, engine: CollectionBuilderEngine):
        self.engine = engine
        # (method, compiled-path, handler); path groups become kwargs
        self._routes: list[tuple[str, re.Pattern[str], Callable[..., Any]]] = [
            ("GET", r"/api/activities", self._activities),
            ("POST", r"/api/radcor", self._radcor),
            ("GET", r"/api/radcor/restart", self._restart),
            ("POST", r"/api/radcor/restart", self._restart),
            ("GET", r"/api/stats/active", self._stats_active),
            ("GET", r"/api/stats/pending", self._stats_pending),
            ("GET", r"/api/utils/collections-available",
             self._collections_available),
            ("GET", r"/api/utils/count-activities", self._count_activities),
            ("GET", r"/api/utils/count-activities-date", self._count_by_date),
            ("GET", r"/api/utils/count-unsuccessfully-activities",
             self._count_failed),
            ("POST", r"/api/check-scenes", self._check_scenes),
            ("GET", r"/api/collections/(?P<collection_id>\d+)/tiles",
             self._collection_tiles),
            ("GET", r"/api/collections", self._collections),
            ("GET", r"/api/grids/(?P<grid_id>\d+)", self._grids),
            ("GET", r"/api/grids", self._grids),
            ("GET", r"/api/providers", self._providers),
        ]
        self._compiled = [(m, re.compile(f"^{p}/?$"), h)
                          for m, p, h in self._routes]

    # -- WSGI entry -----------------------------------------------------

    def __call__(self, environ: dict[str, Any],
                 start_response: Callable[..., Any]) -> Iterable[bytes]:
        method = environ.get("REQUEST_METHOD", "GET").upper()
        path = environ.get("PATH_INFO", "/")
        try:
            handler, kwargs = self._match(method, path)
            args = self._request_args(environ, method)
            body = handler(args, environ, **kwargs)
            status = 200
        except HttpError as exc:
            body, status = {"error": exc.message}, exc.status
        except Exception as exc:  # pragma: no cover - defensive 500
            body, status = {"error": f"{type(exc).__name__}: {exc}"}, 500
        payload = json.dumps(body, default=_json_default).encode("utf-8")
        start_response(_STATUS_TEXT[status], [
            ("Content-Type", "application/json"),
            ("Content-Length", str(len(payload))),
        ])
        return [payload]

    def _match(self, method: str, path: str):
        path_exists = False
        for m, pat, handler in self._compiled:
            match = pat.match(path)
            if not match:
                continue
            path_exists = True
            if m == method:
                return handler, {k: int(v)
                                 for k, v in match.groupdict().items()}
        raise HttpError(405 if path_exists else 404,
                        f"{method} {path}: "
                        + ("method not allowed" if path_exists
                           else "no such route"))

    @staticmethod
    def _request_args(environ: dict[str, Any], method: str) -> dict[str, Any]:
        if method == "POST":
            try:
                n = int(environ.get("CONTENT_LENGTH") or 0)
            except ValueError:
                n = 0
            raw = environ["wsgi.input"].read(n) if n else b"{}"
            try:
                parsed = json.loads(raw.decode("utf-8") or "{}")
            except json.JSONDecodeError as exc:
                raise HttpError(400, f"invalid JSON body: {exc}") from exc
            if not isinstance(parsed, dict):
                raise HttpError(400, "JSON body must be an object")
            return parsed
        return dict(parse_qsl(environ.get("QUERY_STRING", "")))

    # -- handlers -------------------------------------------------------

    def _activities(self, args, environ):
        """views.py:33-49 — paginated activity listing with the
        reference's total/page/per_page/pages envelope."""
        try:
            page = int(args.get("page", 1))
            per_page = int(args.get("per_page", 10))
        except ValueError as exc:
            raise HttpError(400, f"bad pagination arg: {exc}") from exc
        if page < 1 or per_page < 1:
            raise HttpError(400, "page and per_page must be >= 1")
        collection_id = (int(args["collection_id"])
                         if "collection_id" in args else None)
        contains = args.get("activity_type") or None
        total = self.engine.activities_filtered(
            collection_id, contains).count()
        items = rows(self.engine.list_activities(
            page=page, per_page=per_page, collection_id=collection_id,
            activity_type_contains=contains))
        return {
            "total": total,
            "page": page,
            "per_page": per_page,
            "pages": -(-total // per_page),
            "items": items,
        }

    def _radcor(self, args, environ):
        """views.py:52-79 — search + (optionally) dispatch."""
        query = _radcor_query(args)
        action = args.get("action")
        if action not in (None, "preview", "start"):
            # forms.py:142 OneOf(['preview', 'start'])
            raise HttpError(400, f"action must be preview|start, got {action!r}")
        if action == "start":
            result = rows(self.engine.radcor_start(query))
        else:
            result = rows(self.engine.radcor_preview(query))
        return {"tiles": result, "Results": len(result)}

    def _restart(self, args, environ):
        """views.py:82-128 — restart preview/dispatch, with the 4 KiB
        GET query cap steering large id lists to POST."""
        if environ.get("REQUEST_METHOD") == "GET" and \
                len(environ.get("QUERY_STRING", "")) > _MAX_GET_QUERY:
            raise HttpError(
                414, "Query is too long. Use the method POST instead.")
        ids = args.get("ids", args.get("id"))
        if isinstance(ids, str):
            ids = [int(x) for x in ids.split(",") if x]
        elif isinstance(ids, (int, float)):
            ids = [int(ids)]
        elif ids is not None:
            ids = [int(x) for x in ids]
        collection_id = (int(args["collection_id"])
                         if "collection_id" in args else None)
        acts = rows(self.engine.restart_activities(
            ids=ids, status=args.get("status"),
            activity_type=args.get("activity_type"),
            sceneid=args.get("sceneid"),
            collection_id=collection_id))
        action = args.get("action")
        return {
            "action": "PREVIEW" if action is None else action,
            "total": len(acts),
            "activities": acts,
        }

    def _stats_active(self, args, environ):
        return rows(self.engine.stats_active())

    def _stats_pending(self, args, environ):
        return rows(self.engine.stats_pending())

    def _collections_available(self, args, environ):
        return {"collections": [r["collection_id"] for r in
                                rows(self.engine.collections_available())]}

    def _count_activities(self, args, environ):
        # forwards the reference's filter args (controller.py:426-446)
        return rows(self.engine.count_activities(
            start_date=args.get("start_date"),
            last_date=args.get("last_date"),
            collection=int(args["collection"]) if "collection" in args
            else None,
            type_contains=args.get("type")))

    def _count_by_date(self, args, environ):
        return rows(self.engine.count_activities_with_date(
            start_date=args.get("start_date"),
            last_date=args.get("last_date"),
            collection=int(args["collection"]) if "collection" in args
            else None,
            type_contains=args.get("type")))

    def _count_failed(self, args, environ):
        return rows(self.engine.count_failed_activities())

    def _check_scenes(self, args, environ):
        query = _radcor_query(args)
        return rows(self.engine.check_scenes(query))

    def _collections(self, args, environ):
        return rows(self.engine.list_collections())

    def _collection_tiles(self, args, environ, collection_id: int):
        return rows(self.engine.list_collection_tiles(collection_id))

    def _grids(self, args, environ, grid_id: int | None = None):
        bbox = None
        if args.get("bbox"):
            parts = str(args["bbox"]).split(",")
            if len(parts) != 4:
                raise HttpError(400, "bbox must be w,s,e,n")
            bbox = tuple(float(p) for p in parts)
        return rows(self.engine.list_grids(grid_id, bbox=bbox))

    def _providers(self, args, environ):
        return rows(self.engine.list_providers())


def create_app(engine: CollectionBuilderEngine) -> WebApi:
    return WebApi(engine)


def serve(engine: CollectionBuilderEngine, host: str = "127.0.0.1",
          port: int = 5000) -> None:  # pragma: no cover - manual entry
    """Run the API on stdlib wsgiref (the reference's
    ``flask run``-style dev entry point)."""
    from wsgiref.simple_server import make_server

    with make_server(host, port, create_app(engine)) as srv:
        srv.serve_forever()
