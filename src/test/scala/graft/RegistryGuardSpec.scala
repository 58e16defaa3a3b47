package graft

import org.apache.spark.sql.types._

/** Registry-wide output-schema guards over EVERY `SparkEntry.queries`
  * entry, constructed (not executed) at sf0.001.
  *
  * The load-bearing one: no query may OUTPUT a precision-38 decimal
  * column. Round 11/12 proved the correctness harness cannot
  * canonicalize parquet decimal128(38,0) against DuckDB's HUGEINT
  * rendering — `text_nb_auc`/`text_nb_kappa` stayed hash-red for two
  * rounds with bit-identical values in replica. DECIMAL(38,0) interior
  * math is fine (and needed: wide-integer products overflow longs at
  * 100-TB counts); the rule is render-as-string at the output boundary.
  */
class RegistryGuardSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def decimals(dt: DataType): Seq[DecimalType] = dt match {
    case d: DecimalType => Seq(d)
    case s: StructType => s.fields.toSeq.flatMap(f => decimals(f.dataType))
    case a: ArrayType => decimals(a.elementType)
    case m: MapType => decimals(m.keyType) ++ decimals(m.valueType)
    case _ => Nil
  }

  test("no query outputs a precision-38 decimal column") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val offenders = fn(spark, sf).schema.fields
        .flatMap(f => decimals(f.dataType).filter(_.precision >= 38)
          .map(d => s"$name.${f.name}: $d"))
      offenders
    }
    assert(bad.isEmpty, s"precision-38 decimal output columns: $bad")
  }

  test("every query has an oracle or is a documented rows-only sketch") {
    // the only queries allowed to skip the DuckDB oracle are Spark's
    // built-in approximate sketches (each has a hash-graded contract twin)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q_approx_distinct", "q_approx_quantile",
      "text_cms_counts"), s"unexpected rows-only queries: $rowsOnly")
    // and no orphan oracle entries
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
