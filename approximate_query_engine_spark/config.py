"""Environment-driven configuration for the HTTP API.

Reference parity: reference config.py:1-38 exposes SECRET_KEY, DB path,
PORT/HOST, DEBUG and CORS_ORIGINS via env vars (with dev/prod presets).
The Spark analog: the "database" is a scale-factor directory of Parquet
plus a workdir for samples/sketches/catalog, everything else maps 1:1.
No python-dotenv dependency — plain ``os.environ`` (the container has no
dotenv; a deployment that wants .env loading can source it in the shell).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass
class Config:
    """API settings; see :func:`from_env` for the environment mapping."""

    host: str = "0.0.0.0"
    port: int = 8080
    debug: bool = False
    #: '*' (any origin), '' (CORS disabled), or comma-separated origin list
    cors_origins: str = "*"
    #: directory of Parquet tables registered at startup (reference DB_PATH)
    data_dir: str | None = None
    #: samples/sketches/catalog.json location
    workdir: str | None = None
    secret_key: str = field(default="dev-secret-key-change-in-production", repr=False)

    @classmethod
    def from_env(cls) -> "Config":
        """Environment mapping (reference names kept where they exist):

        ============== ======================= =========================
        env var        reference analog        default
        ============== ======================= =========================
        AQE_PORT/PORT  PORT                    8080
        AQE_HOST/HOST  HOST                    0.0.0.0
        FLASK_DEBUG    FLASK_DEBUG             0
        CORS_ORIGINS   CORS_ORIGINS            ``*``
        AQE_DATA_DIR   AQE_DB_PATH             session.DEFAULT_SF_DIR
        AQE_WORKDIR    (implicit sqlite file)  tmp workdir
        SECRET_KEY     SECRET_KEY              dev placeholder
        ============== ======================= =========================
        """
        return cls(
            host=_env("AQE_HOST", _env("HOST", "0.0.0.0")),
            port=int(_env("AQE_PORT", _env("PORT", "8080"))),
            debug=_env("FLASK_DEBUG", "0") == "1",
            cors_origins=_env("CORS_ORIGINS", "*"),
            data_dir=os.environ.get("AQE_DATA_DIR"),
            workdir=os.environ.get("AQE_WORKDIR"),
            secret_key=_env("SECRET_KEY", "dev-secret-key-change-in-production"),
        )

    def allowed_origin(self, origin: str | None) -> str | None:
        """The Access-Control-Allow-Origin value for a request origin, or
        None when CORS is disabled / the origin isn't allowed."""
        if not self.cors_origins:
            return None
        if self.cors_origins == "*":
            return "*"
        allowed = {o.strip() for o in self.cors_origins.split(",") if o.strip()}
        return origin if origin in allowed else None
