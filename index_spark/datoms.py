"""EAVT datom layer (Datomic-style facts over SortedIndex).

Ports the reference's test-level datom model (SURVEY.md §1.1, FIXTURES.md F3;
reference ``src/main/protobuf/test.proto:14-22``,
``test/DatomHelpers.scala:26-135``): entities are flattened to
``(e, a, v, t)`` facts, and the three covering "indexes" EAVT / AVET / VAET
are *sort orders* of the same fact set. In the reference each order is a
separate B+Tree with a custom comparator; here each is a :class:`SortedIndex`
view with a different key declaration over one DataFrame — at scale you
would materialize each order as its own range-partitioned sorted parquet
dataset (three clustered copies, the classic covering-index trade).

Schema (FIXTURES.md F3)::

    e STRING, a STRING, v_text STRING, v_num DOUBLE, t LONG,
    value_tpe INT (1 TEXT / 2 NUMBER / 3 REF), index_tpe INT (1 EAVT / 2 VAET / 3 AVET)

Seq-valued attributes become one datom per element
(``DatomHelpers.scala:293-330``): nothing here assumes (e, a) is unique.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_spark.index import SortedIndex

TEXT, NUMBER, REF = 1, 2, 3
EAVT, VAET, AVET = 1, 2, 3


def datoms_from_table(
    df: DataFrame,
    entity_attr: str,
    id_col: str,
    text_attrs: Sequence[str] = (),
    num_attrs: Sequence[str] = (),
    ref_attrs: dict[str, str] | None = None,
    t: int = 0,
) -> DataFrame:
    """Flatten a relational table into datoms (one per non-null attribute).

    ``entity_attr`` namespaces the entity id (``DatomHelpers.scala:246``
    uses ``ClassName/field`` naming): entity = ``f"{entity_attr}:{id}"``.
    ``ref_attrs`` maps column -> target entity namespace, producing REF
    datoms whose ``v_text`` is the target entity id — the VAET chase key.

    Spark note: this is a stack of narrow projections + unionByName —
    no shuffle at all; the expensive step (clustering into an order) is
    deferred to the index build.
    """
    ref_attrs = ref_attrs or {}
    e = F.concat(F.lit(entity_attr + ":"), F.col(id_col).cast("string"))
    parts: list[DataFrame] = []

    def mk(a: str, v_text, v_num, tpe: int) -> DataFrame:
        return df.select(
            e.alias("e"),
            F.lit(f"{entity_attr}/{a}").alias("a"),
            v_text.alias("v_text"),
            v_num.alias("v_num"),
            F.lit(t).cast("long").alias("t"),
            F.lit(tpe).alias("value_tpe"),
        )

    for c in text_attrs:
        parts.append(mk(c, F.col(c).cast("string"), F.lit(None).cast("double"), TEXT))
    for c in num_attrs:
        parts.append(mk(c, F.lit(None).cast("string"), F.col(c).cast("double"), NUMBER))
    for c, target_ns in ref_attrs.items():
        v = F.concat(F.lit(target_ns + ":"), F.col(c).cast("string"))
        parts.append(mk(c, v, F.lit(None).cast("double"), REF))

    if not parts:
        raise ValueError(
            "datoms_from_table: no attributes declared — pass at least one of "
            "text_attrs / num_attrs / ref_attrs"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("v_text").isNotNull() | F.col("v_num").isNotNull())


class DatomStore:
    """Query facade over a datom DataFrame via the three covering orders.

    Key layouts mirror the reference comparators (``DatomHelpers.scala:40-135``):

    - EAVT: (e, a, v, t)   — entity scan / (e, a) prefix scan
    - AVET: (a, v, e, t)   — attribute-value → entity point lookup
    - VAET: (v, a, e, t)   — reverse reference chase (REF datoms only)

    The value component sorts as ``v_text`` then ``v_num`` (values of one
    attribute share a type in practice, as in the reference tests).
    """

    def __init__(self, datoms: DataFrame):
        self.datoms = datoms
        self.eavt = SortedIndex(datoms, ["e", "a", "v_text", "v_num", "t"])
        self.avet = SortedIndex(datoms, ["a", "v_text", "v_num", "e", "t"])
        self.vaet = SortedIndex(
            datoms.filter(F.col("value_tpe") == REF), ["v_text", "a", "e", "t"]
        )

    # -- DatomsSpec access pattern 1 (DatomsSpec.scala:85-91): AVET point get
    def entities_by_attr_value(self, a: str, v, is_num: bool = False) -> DataFrame:
        """attribute+value → entities, via the AVET order (prefix on (a, v)).

        The numeric path re-keys over the AVET dataset (``self.avet.df``,
        not ``self.datoms``): after :meth:`materialize` those are different
        physical layouts, and the attribute-clustered copy is the one whose
        leading ``a`` prunes partitions — the win materialize() exists for."""
        if is_num:
            idx = SortedIndex(self.avet.df, ["a", "v_num", "e", "t"])
            return idx.prefix((a, float(v))).select("e")
        return self.avet.prefix((a, str(v))).select("e")

    # -- DatomsSpec access pattern 2 (DatomsSpec.scala:98-115): VAET ref chase
    def referencing(self, target_entity: str, a: Optional[str] = None) -> DataFrame:
        """Entities holding a REF datom pointing at ``target_entity``."""
        p = (target_entity,) if a is None else (target_entity, a)
        return self.vaet.prefix(p).select("e", "a")

    # -- DatomsSpec access pattern 3 (DatomsSpec.scala:117-125): EAVT prefix
    def entity(self, e: str, a: Optional[str] = None) -> DataFrame:
        """All facts of one entity (optionally one attribute) in EAVT order."""
        p = (e,) if a is None else (e, a)
        return self.eavt.prefix(p)

    # ------------------------------------------------------------ scale path
    def materialize(self, base_path: str, rows_per_partition: int = 5_000_000) -> "DatomStore":
        """Write the three covering orders as range-partitioned, key-sorted
        parquet (the reference's three physical B+Trees, test.proto index_tpe;
        here: three clustered copies so each access pattern prunes on its own
        sort key). Returns a DatomStore reading the materialized EAVT copy,
        with AVET/VAET views re-pointed at their clustered datasets."""
        from index_spark.snapshots import SnapshotStore

        layouts = {
            "eavt": self.eavt,
            "avet": self.avet,
            "vaet": self.vaet,
        }
        for name, idx in layouts.items():
            SnapshotStore(self.datoms.sparkSession, f"{base_path}/{name}").create(
                idx.key, df=idx.df, rows_per_partition=rows_per_partition
            )
        spark = self.datoms.sparkSession
        out = DatomStore(SnapshotStore(spark, f"{base_path}/eavt").latest().df)
        out.avet = SortedIndex(
            SnapshotStore(spark, f"{base_path}/avet").latest().df, out.avet.key
        )
        out.vaet = SortedIndex(
            SnapshotStore(spark, f"{base_path}/vaet").latest().df, out.vaet.key
        )
        return out
