package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The house portable hash: the top 60 bits of md5 as a non-negative
  * long, mod m. The EXACT expression shape is load-bearing for
  * cross-engine agreement — the DuckDB twin is
  * `CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15)) AS BIGINT) % m`
  * — so every deterministic bucketing/sampling/arm-assignment decision
  * derives from this one definition instead of re-inlined copies. */
object PortableHash {
  /** The raw non-negative 60-bit hash (for callers that mod by a
    * COLUMN, e.g. a data-derived length). */
  def raw(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  def bucket(c: Column, m: Int): Column = raw(c) % m
}
