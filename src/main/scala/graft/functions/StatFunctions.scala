package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level statistical building blocks of the MWAS pipeline.
  *
  * All are pure `Column` expression trees (whole-stage-codegen friendly) —
  * no UDFs. Cites are to the reference at /root/reference/.
  */
object StatFunctions {

  /** Reads-per-million normalization (reference main/mwas_general.py:510-518).
    * The reference first replaces spots==0 with 10^6 (main/mwas_general.py:180)
    * so a zero-spots run degrades to rpm == quantifier. */
  def rpm(quantifier: Column, spots: Column): Column = {
    val safeSpots = when(spots === 0 || spots.isNull, lit(1e6)).otherwise(spots)
    quantifier / safeSpots * lit(1e6)
  }

  /** log2 fold change with the reference's 0/0 -> 0, x/0 -> +inf, 0/x -> -inf
    * sentinel semantics (main/mwas_general.py:325-336; old/mwas_rfam.py:100-111
    * used np.inf). Kept numeric (DoubleType) — render at the sink if string
    * sentinels are needed. */
  def log2FoldChange(meanTrue: Column, meanFalse: Column): Column =
    when(meanTrue === 0 && meanFalse === 0, lit(0.0))
      .when(meanFalse === 0, lit(Double.PositiveInfinity))
      .when(meanTrue === 0, lit(Double.NegativeInfinity))
      .otherwise(log2(meanTrue / meanFalse))
}
