"""REST catalog server + client transport (reference G12).

The reference dispatches its Spark catalog to a REST server when
``CATALOG_URL`` is set (`IcebergSupport.scala:25-31`; README.md:19-22
runs ``tabulario/iceberg-rest`` on :8181). This module provides the
same seam without external jars or network: an in-process HTTP server
exposing the Iceberg-REST-shaped name-service endpoints over a
filesystem warehouse, and the client transport ``Catalog`` uses when
``CATALOG_URL`` is set.

Scope — name service, not commit service: the Iceberg REST spec also
routes metadata COMMITS through the server; in this engine
``VersionedTable`` owns commits via its filesystem OCC (atomic-mkdir
lock + expected-parent CAS, `versioned.py::_commit`), and the server
is a stateless view over the same warehouse — the split a filesystem-
backed REST catalog (tabulario's sqlite-backed image with a mounted
warehouse) has in practice. Endpoints follow the public REST spec's
URL shapes so a client written against them stays recognizable:

    GET    /v1/config                                → warehouse defaults
    GET    /v1/namespaces                            → top-level namespaces
    GET    /v1/namespaces/{ns}/tables                → table identifiers
    GET    /v1/namespaces/{ns}/tables/{table}        → load (location +
                                                       current metadata)
    HEAD   /v1/namespaces/{ns}/tables/{table}        → existence
    DELETE /v1/namespaces/{ns}/tables/{table}        → drop (registration
                                                       only; purge=true
                                                       removes data)

Namespaces and tables are directories under the warehouse root — the
same deterministic mapping the filesystem fallback uses, so flipping
``CATALOG_URL`` on/off never changes where data lives.
"""

from __future__ import annotations

import http.server
import json
import os
import re
import shutil
import threading
import urllib.error
import urllib.parse
import urllib.request


class _Handler(http.server.BaseHTTPRequestHandler):
    server_version = "IcebergByExampleRest/1.0"

    # -- plumbing ------------------------------------------------------------

    def log_message(self, *args):  # quiet: tests assert via responses
        pass

    def _send(self, code: int, payload: dict | None = None) -> None:
        body = b"" if payload is None else json.dumps(payload).encode()
        self.send_response(code)
        if body:
            self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    def _not_found(self, what: str) -> None:
        self._send(404, {"error": {"message": f"{what} not found",
                                   "type": "NoSuchObjectException"}})

    @property
    def _warehouse(self) -> str:
        return self.server.warehouse  # type: ignore[attr-defined]

    _ROUTE = re.compile(
        r"^/v1/namespaces(?:/(?P<ns>[^/]+)(?:/tables(?:/(?P<tbl>[^/]+))?)?)?$"
    )

    def _route(self):
        parsed = urllib.parse.urlparse(self.path)
        if parsed.path == "/v1/config":
            return "config", None, None, parsed
        m = self._ROUTE.match(parsed.path)
        if not m:
            return None, None, None, parsed
        ns = m.group("ns") and urllib.parse.unquote(m.group("ns"))
        tbl = m.group("tbl") and urllib.parse.unquote(m.group("tbl"))
        return "ns", ns, tbl, parsed

    def _table_dir(self, ns: str, tbl: str) -> str:
        return os.path.join(self._warehouse, ns, tbl)

    @staticmethod
    def _is_table_dir(path: str) -> bool:
        # a table directory is one holding this engine's metadata file
        return os.path.isfile(os.path.join(path, "_meta", "table.json"))

    # -- methods -------------------------------------------------------------

    def do_GET(self):
        kind, ns, tbl, parsed = self._route()
        self.server.request_count += 1  # type: ignore[attr-defined]
        if kind == "config":
            return self._send(
                200,
                {
                    "defaults": {},
                    "overrides": {"warehouse": self._warehouse},
                },
            )
        if kind != "ns":
            return self._not_found("route")
        if ns is None:  # list namespaces
            names = sorted(
                n
                for n in (
                    os.listdir(self._warehouse)
                    if os.path.isdir(self._warehouse)
                    else []
                )
                if os.path.isdir(os.path.join(self._warehouse, n))
            )
            return self._send(200, {"namespaces": [[n] for n in names]})
        ns_dir = os.path.join(self._warehouse, ns)
        if not os.path.isdir(ns_dir):
            return self._not_found(f"namespace {ns}")
        if tbl is None:  # list tables
            idents = sorted(
                t
                for t in os.listdir(ns_dir)
                if self._is_table_dir(os.path.join(ns_dir, t))
            )
            return self._send(
                200,
                {
                    "identifiers": [
                        {"namespace": [ns], "name": t} for t in idents
                    ]
                },
            )
        tdir = self._table_dir(ns, tbl)
        if not self._is_table_dir(tdir):
            return self._not_found(f"table {ns}.{tbl}")
        meta_path = os.path.join(tdir, "_meta", "table.json")
        with open(meta_path) as f:
            meta = json.load(f)
        return self._send(
            200,
            {
                "metadata-location": meta_path,
                "metadata": {"location": tdir, **meta},
                "config": {},
            },
        )

    def do_HEAD(self):
        kind, ns, tbl, _ = self._route()
        self.server.request_count += 1  # type: ignore[attr-defined]
        if kind == "ns" and ns and tbl:
            if self._is_table_dir(self._table_dir(ns, tbl)):
                return self._send(204)
            return self._send(404)
        return self._send(400)

    def do_DELETE(self):
        kind, ns, tbl, parsed = self._route()
        self.server.request_count += 1  # type: ignore[attr-defined]
        if kind != "ns" or not (ns and tbl):
            return self._send(400)
        tdir = self._table_dir(ns, tbl)
        if not self._is_table_dir(tdir):
            return self._not_found(f"table {ns}.{tbl}")
        purge = (
            urllib.parse.parse_qs(parsed.query).get("purgeRequested", ["false"])[0]
            == "true"
        )
        if purge:
            shutil.rmtree(tdir, ignore_errors=True)
        else:
            # drop registration only: the metadata file stops naming it
            os.replace(
                os.path.join(tdir, "_meta", "table.json"),
                os.path.join(tdir, "_meta", "table.json.dropped"),
            )
        return self._send(204)


class RestCatalogServer:
    """In-process REST catalog over a warehouse directory.

    ``with RestCatalogServer(warehouse) as url:`` serves on an
    ephemeral localhost port; ``url`` is the base (http://127.0.0.1:N)
    to put in ``CATALOG_URL``."""

    def __init__(self, warehouse: str, port: int = 0):
        self.warehouse = warehouse
        self._httpd = http.server.ThreadingHTTPServer(
            ("127.0.0.1", port), _Handler
        )
        self._httpd.warehouse = warehouse  # type: ignore[attr-defined]
        self._httpd.request_count = 0  # type: ignore[attr-defined]
        self._thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    @property
    def request_count(self) -> int:
        return self._httpd.request_count  # type: ignore[attr-defined]

    def start(self) -> "RestCatalogServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> str:
        self.start()
        return self.url

    def __exit__(self, *exc) -> None:
        self.stop()


class RestCatalogClient:
    """Client transport for a REST catalog: name → location via HTTP.

    Mirrors the Iceberg REST client's loadTable call; the warehouse
    root comes from GET /v1/config, so the client needs ONLY the URL —
    the same contract as pointing Spark's rest catalog at
    ``http://localhost:8181`` (IS:27-30)."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(self.base_url + path, timeout=10) as r:
            return json.load(r)

    def config(self) -> dict:
        return self._get("/v1/config")

    def namespaces(self) -> list[str]:
        return [ns[0] for ns in self._get("/v1/namespaces")["namespaces"]]

    def tables(self, namespace: str) -> list[str]:
        ns = urllib.parse.quote(namespace)
        return [
            i["name"]
            for i in self._get(f"/v1/namespaces/{ns}/tables")["identifiers"]
        ]

    def load_table(self, namespace: str, table: str) -> dict:
        ns, t = urllib.parse.quote(namespace), urllib.parse.quote(table)
        return self._get(f"/v1/namespaces/{ns}/tables/{t}")

    def table_exists(self, namespace: str, table: str) -> bool:
        ns, t = urllib.parse.quote(namespace), urllib.parse.quote(table)
        req = urllib.request.Request(
            f"{self.base_url}/v1/namespaces/{ns}/tables/{t}", method="HEAD"
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return r.status in (200, 204)
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return False
            raise

    def drop_table(
        self, namespace: str, table: str, purge: bool = False
    ) -> None:
        ns, t = urllib.parse.quote(namespace), urllib.parse.quote(table)
        q = "?purgeRequested=true" if purge else ""
        req = urllib.request.Request(
            f"{self.base_url}/v1/namespaces/{ns}/tables/{t}{q}",
            method="DELETE",
        )
        with urllib.request.urlopen(req, timeout=10):
            pass

    def location_for(self, namespace: str, table: str) -> str:
        """Resolve a table name to its warehouse location. For a table
        that doesn't exist yet (CREATE path) the location is derived
        from the server's warehouse root — the same mapping the server
        itself uses, so creates land where loads will find them."""
        try:
            return self.load_table(namespace, table)["metadata"]["location"]
        except urllib.error.HTTPError as e:
            if e.code != 404:
                raise
            wh = self.config()["overrides"]["warehouse"]
            return os.path.join(wh, namespace, table)
