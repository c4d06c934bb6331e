"""HTTP API: the reference's Flask surface, route-for-route.

Contracts (reference app.py:33-324):
    GET  /health                → {"status": "ok"}
    GET  /tables                → {"tables": [...]}
    POST /query                 → {status, plan, result, meta, ml_optimization}
         body {sql, max_rel_error=0.05, prefer_exact=false,
               use_ml_optimization=false, explain=false}
    POST /samples/create        → {sample_table, rows}
         body {table, sample_fraction}
    POST /samples/stratified    → {sample_table, strata[], allocation_type}
         body {table, strata_column, sample_fraction, [variance_column]}
    POST /sketches/create       → {sketch_type, size_bytes}
         body {table, column, sketch_type, parameters{epsilon,delta,...}}
    GET  /sketches[?table=]     → {"sketches": [...]}
    GET  /ml/stats              → learning-loop report

Beyond-reference surfaces (rounds 12-14):
    POST /ann/build, /ann/query         → quantized-IVF ANN index
    POST /dedup/semantic, /dedup/semantic/update → SemDedup pass +
         incremental batch form over the same index
    POST /boilerplate/build, /boilerplate/update → line-frequency index
    POST /lm/build, /lm/update, /lm/score → bigram LM lifecycle
    (updates refuse re-fed ids with 409 — additive counts/codes would
    double-count them; stale-index consumers decline 409)

Run: ``python -m approximate_query_engine_spark.api`` (env:
AQE_PORT, AQE_DATA_DIR, AQE_WORKDIR). Flask is gated behind an
import-try so the engine library works without it.
"""

from __future__ import annotations

try:
    from flask import Flask, jsonify, request

    HAS_FLASK = True
except ImportError:  # pragma: no cover - flask is present in CI image
    HAS_FLASK = False

from approximate_query_engine_spark.config import Config
from approximate_query_engine_spark.engine import AQEngine


def create_app(engine: AQEngine, config: Config | None = None):
    if not HAS_FLASK:
        raise RuntimeError("flask is not installed; the HTTP API is unavailable")
    config = config or Config.from_env()
    app = Flask("approximate_query_engine_spark")
    app.config["SECRET_KEY"] = config.secret_key

    @app.after_request
    def _cors(resp):  # reference config.py CORS_ORIGINS parity
        # the ACAO header value depends on the request's Origin, so shared
        # caches must key on it or one origin's header leaks to another
        resp.headers.add("Vary", "Origin")
        origin = config.allowed_origin(request.headers.get("Origin"))
        if origin:
            resp.headers["Access-Control-Allow-Origin"] = origin
            resp.headers["Access-Control-Allow-Headers"] = "Content-Type"
            resp.headers["Access-Control-Allow-Methods"] = "GET, POST, OPTIONS"
        return resp

    @app.get("/")
    def index():
        from flask import render_template

        return render_template("index.html")

    @app.get("/health")
    def health():
        return jsonify({"status": "ok"})

    @app.get("/tables")
    def tables():
        return jsonify({"tables": engine.tables()})

    @app.post("/query")
    def query():
        body = request.get_json(force=True, silent=True) or {}
        sql = body.get("sql")
        if not sql:
            return jsonify({"status": "error", "error": "missing 'sql'"}), 400
        out = engine.query(
            sql,
            max_rel_error=float(body.get("max_rel_error", 0.05)),
            prefer_exact=bool(body.get("prefer_exact", False)),
            use_ml_optimization=bool(body.get("use_ml_optimization", False)),
            explain=bool(body.get("explain", False)),
            max_rank_error=(
                float(body["max_rank_error"])
                if body.get("max_rank_error") is not None
                else None
            ),
        )
        status = 200 if out.get("status") == "ok" else 500
        return jsonify(out), status

    @app.post("/query/progressive")
    def query_progressive():
        """Beyond-reference: online aggregation (progressive.py) —
        refine until the reported CI meets target_rel_error. Optional
        mode='systematic' + key_expr for the deterministic ladder."""
        body = request.get_json(force=True, silent=True) or {}
        sql = body.get("sql")
        if not sql:
            return jsonify({"status": "error", "error": "missing 'sql'"}), 400
        kwargs = {}
        if body.get("mode"):
            kwargs["mode"] = body["mode"]
        if body.get("key_expr"):
            kwargs["key_expr"] = body["key_expr"]
        try:
            out = engine.progressive_query(
                sql,
                float(body.get("target_rel_error", 0.05)),
                seed=int(body.get("seed", 42)),
                **kwargs,
            )
            return jsonify(out)
        except (ValueError, TypeError) as e:
            # bad input types (null/list where a number belongs, unknown
            # mode, missing key_expr) are client errors, not 500s
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/samples/create")
    def samples_create():
        body = request.get_json(force=True, silent=True) or {}
        try:
            out = engine.create_sample(
                body["table"], float(body.get("sample_fraction", 0.01))
            )
            return jsonify(out)
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/samples/systematic")
    def samples_systematic():
        """Materialized deterministic 1-in-k sample (round 6): md5-keyed
        membership, exact design fraction — engine-reproducible, and
        bucket-partitioned when the base table has a registered layout."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            out = engine.create_systematic_sample(
                body["table"], int(body["k"]), body["key_expr"]
            )
            return jsonify(out)
        except (KeyError, ValueError, TypeError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/samples/stratified")
    def samples_stratified():
        body = request.get_json(force=True, silent=True) or {}
        try:
            out = engine.create_stratified_sample(
                body["table"],
                body["strata_column"],
                float(body.get("sample_fraction", 0.05)),
                variance_column=body.get("variance_column"),
            )
            return jsonify(out)
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/sketches/create")
    def sketches_create():
        body = request.get_json(force=True, silent=True) or {}
        try:
            out = engine.create_sketch(
                body["table"],
                body.get("column"),
                body.get("sketch_type", "hll"),
                body.get("parameters") or {},
            )
            return jsonify(out)
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.get("/sketches")
    def sketches_list():
        return jsonify({"sketches": engine.list_sketches(request.args.get("table"))})

    @app.post("/tables/analyze")
    def tables_analyze():
        """Beyond-reference: one-pass min/max + row-count stats collection
        feeding the planner's predicate-selectivity estimates."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            ranges = engine.analyze_table(body["table"], body.get("columns"))
            return jsonify(
                {"table": body["table"],
                 "columns": {c: list(v) for c, v in ranges.items()}}
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/tables/partition")
    def tables_partition():
        """Beyond-reference: rewrite a table as time-partitioned parquet
        (day/month/year buckets); queries filtering on the bucket column
        prune at file-listing time (operators/partitioning.py)."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.partition_table(
                    body["table"],
                    body["ts_col"],
                    grain=body.get("grain", "day"),
                    name=body.get("name"),
                )
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/tables/register")
    def tables_register():
        body = request.get_json(force=True, silent=True) or {}
        try:
            out = engine.register_file(
                body["table"],
                body["path"],
                fmt=body.get("format", "csv"),
                options=body.get("options"),
            )
            return jsonify(out)
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/rollups/create")
    def rollups_create():
        """Beyond-reference: materialize a continuous-aggregate rollup;
        matching SQL aggregates over the raw table are then answered from
        it exactly (engine._route_rollup / operators/rollup.py)."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.create_rollup(
                    body["table"],
                    body["time_col"],
                    body["bucket"],
                    dims=body.get("dims"),
                    measures=body.get("measures"),
                    distinct_cols=body.get("distinct_cols"),
                    hll_lgk=int(body.get("hll_lgk", 12)),
                    quantile_cols=body.get("quantile_cols"),
                    kll_k=int(body.get("kll_k", 200)),
                    topk_cols=body.get("topk_cols"),
                    topk_budget=int(body.get("topk_budget", 1024)),
                    theta_cols=body.get("theta_cols"),
                    theta_lgk=int(body.get("theta_lgk", 12)),
                )
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/rollups/refresh")
    def rollups_refresh():
        """Incremental tail refresh (append-mostly contract): recompute
        only the affected date directories and re-arm routing."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.refresh_rollup(
                    body["table"],
                    view=body.get("view"),
                    since=body.get("since"),
                )
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/rollups/top_items")
    def rollups_top_items():
        """Heavy hitters over a bucket-aligned window from COMBINED
        rollup top-k state (engine.rollup_top_items) — the fact table is
        never re-read."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            rows = engine.rollup_top_items(
                body["table"],
                body["column"],
                k=int(body.get("k", 10)),
                lo=body.get("lo"),
                hi=body.get("hi"),
                candidate_k=(
                    int(body["candidate_k"])
                    if body.get("candidate_k") is not None
                    else None
                ),
                dims=body.get("dims"),
            ).collect()
            return jsonify({"items": [r.asDict() for r in rows]})
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/rollups/audience_diff")
    def rollups_audience_diff():
        """New/returning/churned distinct keys between two windows from
        theta rollup state (engine.rollup_audience_diff) — the set
        algebra HLL cannot express."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.rollup_audience_diff(
                    body["table"],
                    body["column"],
                    body["a_lo"],
                    body["a_hi"],
                    body["b_lo"],
                    body["b_hi"],
                    dims=body.get("dims"),
                    # round 10: with time_col, no-rollup answers exactly
                    # from one raw pass and feeds the theta advisor
                    time_col=body.get("time_col"),
                )
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/overlap")
    def overlap():
        """Pairwise audience overlap between segments
        (engine.segment_overlap, round 10): routed to theta rollup
        state when one serves, else one raw scan that feeds the theta
        advisor when ``time_col`` is named. Optional [lo, hi) bounds
        window the overlap on both paths."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            r = engine.segment_overlap(
                body["table"],
                body["segment_col"],
                body["key_col"],
                lg_k=int(body.get("lg_k", 12)),
                pairs=(
                    [tuple(p) for p in body["pairs"]]
                    if body.get("pairs")
                    else None
                ),
                time_col=body.get("time_col"),
                lo=body.get("lo"),
                hi=body.get("hi"),
                dims=body.get("dims"),
            )
            return jsonify(
                {
                    "source": r["source"],
                    "reason": r["reason"],
                    "rows": [row.asDict() for row in r["df"].collect()],
                }
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/ann/build")
    def ann_build():
        """Build + register the quantized-IVF ANN index for a table
        (engine.build_ivf_codes, round 12): coarse k-means centroids,
        scalar-quantized codes partitioned by centroid, clamp-drift
        policy under maintenance."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            entry = engine.build_ivf_codes(
                body["table"],
                vec_col=body.get("vec_col", "embedding"),
                id_col=body.get("id_col", "vec_id"),
                nlist=int(body.get("nlist", 16)),
                levels=int(body.get("levels", 256)),
                sample_fraction=(
                    float(body["sample_fraction"])
                    if body.get("sample_fraction") is not None
                    else None
                ),
                sample_rows=int(body.get("sample_rows", 10_000)),
                seed=int(body.get("seed", 42)),
                clamp_threshold=float(body.get("clamp_threshold", 0.005)),
                skew_threshold=float(body.get("skew_threshold", 8.0)),
                retrain=bool(body.get("retrain", False)),
                # bring-your-own coarse geometry (round 14): nlist x dim
                # float vectors, e.g. trained offline
                centroids=(
                    [[float(x) for x in c] for c in body["centroids"]]
                    if body.get("centroids") is not None
                    else None
                ),
            )
            return jsonify(entry)
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/ann/query")
    def ann_query():
        """Batch kNN from the registered index (engine.knn): queries
        come as ``ids`` (vectors pulled from the indexed table) or
        inline ``vectors`` ([[id, [floats]], ...]). Declines with 409
        when the index is stale — run maintenance first."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            table = body["table"]
            info = engine.catalog.quantized_codes.get(table) or {}
            id_col = info.get("id_col", body.get("id_col", "vec_id"))
            vec_col = info.get("vec_col", body.get("vec_col", "embedding"))
            if body.get("ids") is not None:
                # typed isin filter, NOT an int()-coerced SQL IN-list
                # splice: id_col is caller-chosen at build time and may
                # be string-typed — coercion would 400 every non-integer
                # id, and literal splicing is brittle besides (r12
                # ADVICE). The list is bounded so the filter stays a
                # broadcastable in-set predicate, never a giant plan.
                from pyspark.sql import functions as F

                ids = list(body["ids"])
                if not ids:
                    raise ValueError("ids must be a non-empty list")
                if len(ids) > 10_000:
                    raise ValueError(
                        "ids list too large (>10000) — pass vectors or "
                        "run engine.knn with a query DataFrame instead"
                    )
                queries = engine.spark.table(table).where(
                    F.col(id_col).isin(ids)
                )
            elif body.get("vectors") is not None:
                queries = engine.spark.createDataFrame(
                    [(int(i), [float(x) for x in v]) for i, v in body["vectors"]],
                    f"{id_col} long, {vec_col} array<double>",
                )
            else:
                raise KeyError("ids or vectors")
            rows = engine.knn(
                table,
                queries,
                k=int(body.get("k", 10)),
                nprobe=int(body.get("nprobe", 4)),
                shortlist_factor=int(body.get("shortlist_factor", 4)),
                exclude_self=bool(body.get("exclude_self", False)),
            ).collect()
            return jsonify({"neighbors": [r.asDict() for r in rows]})
        except KeyError as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except ValueError as e:
            # staleness decline is the honest 409: the index exists but
            # no longer accounts for the base table
            code = 409 if "stale" in str(e) else 400
            return jsonify({"status": "error", "error": str(e)}), code
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.get("/ann/skew")
    def ann_skew():
        """Bucket-population skew of a registered IVF index (round 14 —
        the observability face of the maintenance skew policy): the
        metadata-only footer probe when the layout allows it, the scan
        form otherwise, plus the entry's threshold and whether a coarse
        re-train is currently advised. Lets an operator watch probe-cost
        drift between maintenance sweeps without triggering one."""
        table = request.args.get("table")
        if not table:
            return jsonify({"status": "error", "error": "missing 'table'"}), 400
        info = engine.catalog.quantized_codes.get(table)
        if info is None or info.get("kind") != "ivf":
            return (
                jsonify(
                    {
                        "status": "error",
                        "error": f"no ANN index registered for {table!r}",
                    }
                ),
                404,
            )
        try:
            from approximate_query_engine_spark.functions.quantization import (  # noqa: E501
                ivf_bucket_skew,
                ivf_bucket_skew_from_footers,
            )

            nlist = int(info.get("nlist", 0)) or None
            try:
                skew = ivf_bucket_skew_from_footers(
                    engine.spark, info["path"], nlist=nlist
                )
                probe = "footers"
            except Exception:  # noqa: BLE001 - fall back to the scan
                skew = ivf_bucket_skew(
                    engine.spark.read.parquet(info["path"]), nlist=nlist
                )
                probe = "scan"
            threshold = float(info.get("skew_threshold", 8.0))
            return jsonify(
                {
                    "table": table,
                    "skew": skew,
                    "probe": probe,
                    "skew_threshold": threshold,
                    "retrain_advised": skew["ratio"] > threshold,
                }
            )
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/dedup/semantic")
    def dedup_semantic():
        """Semantic (embedding-cosine) near-duplicate detection over a
        table's registered ANN index (engine.semantic_dedup, round 14 —
        the HTTP surface VERDICT r13 #2 flagged as missing): the full
        SemDedup pass through the persisted inverted file. Returns the
        above-threshold pairs (``return_pairs``) or the duplicate count
        plus a bounded sample of flagged ids. Declines with 409 when
        the index is stale — run maintenance first."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            from pyspark.sql import functions as F

            table = body["table"]
            threshold = float(body.get("threshold", 0.95))
            limit = int(body.get("limit", 100))
            probes = int(body.get("assign_probes", 1))
            if body.get("return_pairs"):
                rows = (
                    engine.semantic_dedup(
                        table,
                        threshold=threshold,
                        return_pairs=True,
                        assign_probes=probes,
                    )
                    .limit(limit)
                    .collect()
                )
                return jsonify({"pairs": [r.asDict() for r in rows]})
            marked = engine.semantic_dedup(
                table, threshold=threshold, assign_probes=probes
            )
            dups = marked.where(F.col("is_semantic_duplicate"))
            info = engine.catalog.quantized_codes.get(table) or {}
            id_col = info.get("id_col", "vec_id")
            flagged = [
                r[id_col] for r in dups.select(id_col).limit(limit).collect()
            ]
            return jsonify(
                {"duplicates": dups.count(), "flagged_ids": flagged}
            )
        except KeyError as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except ValueError as e:
            code = 409 if "stale" in str(e) else 400
            return jsonify({"status": "error", "error": str(e)}), code
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/dedup/semantic/update")
    def dedup_semantic_update():
        """Incremental semantic dedup of a NEW batch (a registered
        view) against the persisted index
        (engine.semantic_dedup_update): the batch assigns into the
        registered buckets, pairs only within them, and its codes
        append into the assigned table. Re-fed vector ids are refused
        with 409; a stale index declines with 409; NULL-id batches are
        a 400."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            from pyspark.sql import functions as F

            out, entry = engine.semantic_dedup_update(
                body["table"],
                engine.spark.table(body["batch_view"]),
                threshold=float(body.get("threshold", 0.95)),
                return_pairs=bool(body.get("return_pairs", False)),
                assign_probes=int(body.get("assign_probes", 1)),
            )
            limit = int(body.get("limit", 100))
            if body.get("return_pairs"):
                rows = out.limit(limit).collect()
                return jsonify(
                    {"pairs": [r.asDict() for r in rows], "entry": entry}
                )
            dups = out.where(F.col("is_semantic_duplicate"))
            flagged = [
                r[entry["id_col"]]
                for r in dups.select(entry["id_col"]).limit(limit).collect()
            ]
            return jsonify(
                {
                    "duplicates": dups.count(),
                    "flagged_ids": flagged,
                    "entry": entry,
                }
            )
        except KeyError as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except ValueError as e:
            code = (
                409
                if ("stale" in str(e) or "re-feeds vector ids" in str(e))
                else 400
            )
            return jsonify({"status": "error", "error": str(e)}), code
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/boilerplate/build")
    def boilerplate_build():
        """Build + register the persisted line-frequency index
        (engine.build_boilerplate_index, round 12)."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.build_boilerplate_index(
                    body["table"],
                    text_col=body.get("text_col", "text"),
                    id_col=body.get("id_col", "doc_id"),
                    min_docs=int(body.get("min_docs", 10)),
                    min_chars=int(body.get("min_chars", 1)),
                )
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/boilerplate/update")
    def boilerplate_update():
        """Clean a NEW batch (a registered view) against the persisted
        index and merge its counts (engine.update_boilerplate_index).
        Re-fed document ids are refused with 409 — additive counts
        would double-count them."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            cleaned, entry = engine.update_boilerplate_index(
                body["table"], engine.spark.table(body["batch_view"])
            )
            from pyspark.sql import functions as F

            stats = cleaned.agg(
                F.count(F.lit(1)).alias("docs"),
                F.coalesce(F.sum("lines_removed"), F.lit(0)).alias(
                    "lines_removed"
                ),
            ).collect()[0]
            return jsonify(
                {
                    "cleaned_docs": int(stats["docs"]),
                    "lines_removed": int(stats["lines_removed"]),
                    "entry": entry,
                }
            )
        except KeyError as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except ValueError as e:
            code = 409 if "re-feeds document" in str(e) else 400
            return jsonify({"status": "error", "error": str(e)}), code
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/lm/build")
    def lm_build():
        """Fit + register the bigram LM on a reference table
        (engine.build_lm_index, round 13 — the CCNet perplexity-filter
        model as a versioned catalog artifact)."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.build_lm_index(
                    body["table"],
                    text_col=body.get("text_col", "text"),
                    id_col=body.get("id_col", "doc_id"),
                )
            )
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/lm/update")
    def lm_update():
        """Merge a NEW reference batch's counts into the registered LM
        (engine.update_lm_index). Re-fed document ids are refused with
        409 — additive gram counts would double-count them."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.update_lm_index(
                    body["table"], engine.spark.table(body["batch_view"])
                )
            )
        except KeyError as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except ValueError as e:
            # the re-feed CONFLICT is the honest 409 (the index exists
            # but already counted those ids); every other ValueError —
            # including the NULL-id refusal, whose message also says
            # 'double-counting' — is a malformed request, a plain 400
            # (r13 ADVICE)
            code = 409 if "re-feeds document" in str(e) else 400
            return jsonify({"status": "error", "error": str(e)}), code
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/lm/score")
    def lm_score():
        """Score a candidate view against the registered LM
        (engine.lm_score): per-document integer evidence + perplexity,
        optionally threshold-filtered (max_ppl / max_oov_frac /
        min_tokens). Row payload is bounded by ``limit``."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            scored = engine.lm_score(
                body["table"],
                body["docs_view"],
                id_col=body.get("id_col", "doc_id"),
                k_smooth=float(body.get("k_smooth", 1.0)),
                max_ppl=(
                    float(body["max_ppl"])
                    if body.get("max_ppl") is not None
                    else None
                ),
                max_oov_frac=(
                    float(body["max_oov_frac"])
                    if body.get("max_oov_frac") is not None
                    else None
                ),
                min_tokens=(
                    int(body["min_tokens"])
                    if body.get("min_tokens") is not None
                    else None
                ),
            )
            limit = int(body.get("limit", 100))
            rows = scored.limit(limit).collect()
            return jsonify({"scored": [r.asDict() for r in rows]})
        except (KeyError, ValueError) as e:
            return jsonify({"status": "error", "error": str(e)}), 400
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.post("/rollups/quantile_bounds")
    def rollups_quantile_bounds():
        """Value bracket implied by KLL's rank guarantee for a window's
        quantile, from merged rollup state (round 8 — the concrete
        answer to 'what does a 1.6% rank error mean in value space for
        MY data')."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            return jsonify(
                engine.rollup_quantile_bounds(
                    body["table"],
                    body["column"],
                    float(body["p"]),
                    lo=body.get("lo"),
                    hi=body.get("hi"),
                    dims=body.get("dims"),
                )
            )
        except KeyError as e:
            return (
                jsonify(
                    {"status": "error", "error": f"missing field {e}"}
                ),
                400,
            )
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.get("/rollups/recommend")
    def rollups_recommend():
        """The materialization advisor: recurring rollup-shaped queries
        that ran WITHOUT a rollup, merged into concrete create_rollup
        suggestions (engine.recommend_rollups); converges to empty once
        followed."""
        try:
            min_count = int(request.args.get("min_count", 3))
            return jsonify(
                {"recommendations": engine.recommend_rollups(min_count)}
            )
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.get("/layouts/recommend")
    def layouts_recommend():
        """The layout advisor (round 8): recurring time-bounded query
        shapes that ran WITHOUT a partitioned layout, merged into
        concrete partition_table suggestions
        (engine.recommend_partition_layouts); converges to empty once
        followed."""
        try:
            min_count = int(request.args.get("min_count", 3))
            return jsonify(
                {
                    "recommendations": engine.recommend_partition_layouts(
                        min_count
                    )
                }
            )
        except Exception as e:
            return jsonify({"status": "error", "error": str(e)}), 500

    @app.get("/rollups")
    def rollups_list():
        return jsonify(
            {
                table: [
                    {k: v for k, v in info.items() if k != "path"}
                    for info in entries
                ]
                for table, entries in engine.catalog.rollups.items()
            }
        )

    @app.get("/layouts")
    def layouts_list():
        """Registered time-partitioned layouts, one per table (round 8 —
        the storage sibling of GET /rollups)."""
        return jsonify(
            {
                table: {k: v for k, v in info.items() if k != "path"}
                for table, info in engine.catalog.partitioned_views.items()
            }
        )

    @app.get("/ml/stats")
    def ml_stats():
        return jsonify(engine.ml_stats())

    @app.post("/maintenance/run")
    def maintenance_run():
        """Freshness policies over cataloged samples/sketches (no reference
        analog — its artifacts silently drift; SURVEY.md §2.5/§2.6)."""
        body = request.get_json(force=True, silent=True) or {}
        try:
            kwargs = dict(
                max_drift=float(body.get("max_drift", 0.10)),
                max_age_sec=(
                    float(body["max_age_sec"]) if "max_age_sec" in body else None
                ),
                dry_run=bool(body.get("dry_run", False)),
                compact_files_over=(
                    int(body["compact_files_over"])
                    if "compact_files_over" in body
                    else None
                ),
                apply_advice=bool(body.get("apply_advice", False)),
                advice_max_apply=int(body.get("advice_max_apply", 1)),
                # an explicit JSON null means UNLIMITED (the engine's
                # None budget); absent means the default
                advice_max_state_rows=(
                    None
                    if "advice_max_state_rows" in body
                    and body["advice_max_state_rows"] is None
                    else int(body.get("advice_max_state_rows", 5_000_000))
                ),
                advice_max_buckets=(
                    None
                    if "advice_max_buckets" in body
                    and body["advice_max_buckets"] is None
                    else int(body.get("advice_max_buckets", 100_000))
                ),
                # evidence re-proof scan budget (round 10): absent or
                # JSON null = unbounded, 0 = defer every re-proof
                max_reprove_scans=(
                    int(body["max_reprove_scans"])
                    if body.get("max_reprove_scans") is not None
                    else None
                ),
            )
        except (TypeError, ValueError) as e:
            # a non-numeric budget is a client error — the same JSON
            # envelope the sibling endpoints return, never a bare 500
            return jsonify({"status": "error", "error": str(e)}), 400
        return jsonify(engine.maintain(**kwargs))

    return app


def main():  # pragma: no cover - manual entry point
    from approximate_query_engine_spark.session import DEFAULT_SF_DIR, get_spark

    cfg = Config.from_env()
    spark = get_spark("aqe-api")
    engine = AQEngine(
        spark,
        workdir=cfg.workdir,
        data_dir=cfg.data_dir or DEFAULT_SF_DIR,
    )
    app = create_app(engine, cfg)
    app.run(host=cfg.host, port=cfg.port, debug=cfg.debug)


if __name__ == "__main__":
    main()
