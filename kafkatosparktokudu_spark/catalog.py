"""Target-table catalog: ``{table_name: TargetTable}``.

Replaces the reference's per-record runtime Kudu schema lookup
(``kuduClient.openTable`` + ``kuduTable.getSchema``,
/root/reference/.../KuduManager.scala:70-71). The catalog — not the incoming
JSON — is authoritative for payload types (the reference enumerates the
target schema and casts each present payload string to the column type,
KuduManager.scala:82-110). One catalog lookup per plan build instead of two
network round-trips per record.

Type bridging (Kudu ``Type`` enum → Spark, SURVEY.md §1.3): BINARY→binary,
STRING→string, BOOL→boolean, DOUBLE→double, FLOAT→float,
INT8/16/32/64→byte/short/int/long, UNIXTIME_MICROS→timestamp. This fixes the
reference's lossy default ``.toInt`` cast for INT64/timestamps
(KuduManager.scala:105-107 — documented bug, SURVEY.md §2.1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# Convention columns the pipeline adds to every target table
# (KuduManager.scala:78,80 delete_state; :113 time_stamp).
DELETE_STATE = "delete_state"
TIME_STAMP = "time_stamp"

# The fixed audit table (KuduManager.scala:137-153) — all strings.
PUB_EVENT = "pub_event"
PUB_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("current_ts", T.StringType(), True),
        T.StructField(DELETE_STATE, T.StringType(), True),
        T.StructField("his_delete_state", T.StringType(), True),
        T.StructField(TIME_STAMP, T.StringType(), True),
    ]
)


@dataclass
class TargetTable:
    """One keyed upsert target (≙ one Kudu table)."""

    name: str
    key: str  # PK column; reference convention: always "ID" (KuduManager.scala:54)
    payload: T.StructType  # typed payload columns, key included

    @property
    def full_schema(self) -> T.StructType:
        """payload + pipeline convention columns."""
        return T.StructType(
            list(self.payload.fields)
            + [
                T.StructField(DELETE_STATE, T.StringType(), True),
                T.StructField(TIME_STAMP, T.StringType(), True),
            ]
        )


def default_catalog() -> dict[str, TargetTable]:
    """The FIXTURES.md §B.2 catalog: covers every type the reference's
    dispatch handles (STRING/DOUBLE/FLOAT/INT/BOOL/UNIXTIME_MICROS)."""
    emp = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("salary", T.DoubleType(), True),
            T.StructField("dept_id", T.IntegerType(), True),
            T.StructField("active", T.BooleanType(), True),
            T.StructField("hire_ts", T.TimestampType(), True),
        ]
    )
    dept = T.StructType(
        [
            T.StructField("id", T.StringType(), False),
            T.StructField("dname", T.StringType(), True),
            T.StructField("budget", T.FloatType(), True),
        ]
    )
    return {
        "emp": TargetTable("emp", "id", emp),
        "dept": TargetTable("dept", "id", dept),
    }
