"""Declarative transform layer: explode → project/rename → flat records.

The reference's nine Go-template programs (``data/transform/*.tmpl``,
SURVEY §2.2 T1-T9) each compute *explode → project → emit flat string
records*. Instead of porting the template engine, the same dataflow is a
declarative :class:`TransformSpec` compiled to DataFrame ops — the spec
is JSON-able (the reference's config-driven dispatch, ``main.go:158-188``
P10) and the compiled plan is pure Catalyst (explode is a native
generator; projection/rename/literals are column expressions inside
whole-stage codegen — no Python executes per row).

Covered template primitives (SURVEY §2.2 P1-P10):
- P1 ``range``/flatten → ``F.explode_outer`` (outer: an empty ``builds``
  array must not drop the parent scope mid-chain; final rows with a NULL
  key are filtered like the template emitting nothing).
- P2 nested/dotted access incl. kebab-case keys → backtick-quoted paths.
- P3 rename → ``.alias``; P4 literal columns → ``F.lit``.
- P8 everything cast to string (the templates stringify every value).
- Correlated flatten (T9/J3): earlier explode aliases stay in scope, so
  a parent key is naturally carried into each child row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NODE = "CREATE_NODE"
RELATION = "CREATE_RELATION"

#: Explicit schema for the reference-shaped source document (FIXTURES.md §A).
#: Explicit schemas are the production choice (SURVEY §1.2): no inference
#: pass, and an EMPTY ``buckets`` array still types as struct (inference
#: on an empty array degrades to ``array<string>`` and breaks every
#: field access — the emptied-source sync, main.go:289-292, hits exactly
#: this).
PACKER_SOURCE_SCHEMA = (
    "buckets array<struct<id:string,name:string,`created-at`:string,"
    "`updated-at`:string,resource_name:string,"
    "location:struct<organization_id:string,project_id:string>,"
    "latest_version:struct<id:string,name:string,"
    "builds:array<struct<id:string,created_at:string,updated_at:string>>>>>"
)


def _path_col(path: str) -> Column:
    """Dotted path → Column, each segment backtick-quoted so kebab-case
    keys like ``created-at`` resolve (FIXTURES.md: mixed naming is
    load-bearing)."""
    quoted = ".".join(f"`{seg}`" for seg in path.split("."))
    return F.col(quoted)


@dataclass(frozen=True)
class TransformSpec:
    """One template program: ordered explodes + a flat projection.

    ``explode``: list of ``(path, alias)`` — each path may reference a
    previous alias (``b.latest_version.builds``).
    ``project``: output column → source path, ``lit:<value>`` for
    literal columns (T4's ``latest="true"``), or ``expr:<sql>`` for
    computed columns — the analog of the reference's template FuncMap
    (``add``/``sub`` helpers, main.go:149-156, §2.7): any Spark SQL
    expression, including session-registered UDFs, stays available to
    spec authors without a custom function registry.
    ``distinct``: collapse duplicate output rows — made explicit where
    the reference leaned on Cypher MERGE identity (T2/T3/T6-T8).
    """

    name: str
    kind: str = NODE  # NODE | RELATION  (model.go:26-31 Function.Type)
    explode: tuple[tuple[str, str], ...] = ()
    project: dict[str, str] = field(default_factory=dict)
    distinct: bool = False

    def apply(self, doc: DataFrame) -> DataFrame:
        df = doc
        for path, alias in self.explode:
            df = df.select("*", F.explode_outer(_path_col(path)).alias(alias))
        cols = []
        for out, src in self.project.items():
            if src.startswith("lit:"):
                cols.append(F.lit(src[4:]).cast("string").alias(out))
            elif src.startswith("expr:"):
                cols.append(F.expr(src[5:]).cast("string").alias(out))
            else:
                cols.append(_path_col(src).cast("string").alias(out))
        out_df = df.select(*cols)
        # A template iterating an empty/missing array emits no records;
        # explode_outer kept the row as NULLs — drop rows whose key cols
        # are all NULL to match.
        key_cols = [c for c in ("external_id", "a_id", "b_id") if c in out_df.columns]
        if key_cols:
            cond = None
            for k in key_cols:
                c = F.col(k).isNotNull()
                cond = c if cond is None else (cond & c)
            out_df = out_df.where(cond)
        if self.distinct:
            out_df = out_df.dropDuplicates()
        return out_df


# ---------------------------------------------------------------------
# The reference's shipped config (main.go:21-82): the HCP Packer registry
# model — 5 node transforms + 4 edge transforms over one nested doc.
# Each spec cites its template file.
# ---------------------------------------------------------------------

#: T1 transform_bucket.json.tmpl:2-11
BUCKET = TransformSpec(
    name="bucket",
    kind=NODE,
    explode=(("buckets", "b"),),
    project={
        "external_id": "b.id",
        "name": "b.name",
        "created_at": "b.created-at",
        "updated_at": "b.updated-at",
        "resource_name": "b.resource_name",
    },
)

#: T2 transform_organization.json.tmpl:2-6 (dup rows → explicit distinct)
ORGANIZATION = TransformSpec(
    name="organization",
    kind=NODE,
    explode=(("buckets", "b"),),
    project={"external_id": "b.location.organization_id"},
    distinct=True,
)

#: T3 transform_project.json.tmpl:2-6
PROJECT = TransformSpec(
    name="project",
    kind=NODE,
    explode=(("buckets", "b"),),
    project={"external_id": "b.location.project_id"},
    distinct=True,
)

#: T4 transform_version.json.tmpl:2-7 (nested struct + literal column)
VERSION = TransformSpec(
    name="version",
    kind=NODE,
    explode=(("buckets", "b"),),
    project={
        "external_id": "b.latest_version.id",
        "name": "b.latest_version.name",
        "latest": "lit:true",
    },
)

#: T5 transform_build.json.tmpl:2-9 (nested double explode)
BUILD = TransformSpec(
    name="packer_build",
    kind=NODE,
    explode=(("buckets", "b"), ("b.latest_version.builds", "bd")),
    project={
        "external_id": "bd.id",
        "created_at": "bd.created_at",
        "updated_at": "bd.updated_at",
    },
)

#: T6 transform_org_project_R.json.tmpl:2-7
ORG_PROJECT_R = TransformSpec(
    name="org_project_R",
    kind=RELATION,
    explode=(("buckets", "b"),),
    project={"a_id": "b.location.organization_id", "b_id": "b.location.project_id"},
    distinct=True,
)

#: T7 transform_project_bucket_R.json.tmpl:2-7
PROJECT_BUCKET_R = TransformSpec(
    name="project_bucket_R",
    kind=RELATION,
    explode=(("buckets", "b"),),
    project={"a_id": "b.location.project_id", "b_id": "b.id"},
    distinct=True,
)

#: T8 transform_bucket_version_R.json.tmpl:2-6
BUCKET_VERSION_R = TransformSpec(
    name="bucket_version_R",
    kind=RELATION,
    explode=(("buckets", "b"),),
    project={"a_id": "b.id", "b_id": "b.latest_version.id"},
    distinct=True,
)

#: T9 transform_version_build_R.json.tmpl:2-9 (correlated flatten, J3:
#: parent key latest_version.id carried across the child explode)
VERSION_BUILD_R = TransformSpec(
    name="version_build_R",
    kind=RELATION,
    explode=(("buckets", "b"), ("b.latest_version.builds", "bd")),
    project={"a_id": "b.latest_version.id", "b_id": "bd.id"},
    distinct=True,
)

ALL_PACKER_TRANSFORMS: tuple[TransformSpec, ...] = (
    BUCKET,
    ORGANIZATION,
    PROJECT,
    VERSION,
    BUILD,
    ORG_PROJECT_R,
    PROJECT_BUCKET_R,
    BUCKET_VERSION_R,
    VERSION_BUILD_R,
)
