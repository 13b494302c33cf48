package graft

/** Driver-contract meta-checks over the whole catalog: the gate compares
  * Spark results to DuckDB with columns sorted by NAME, so an alias that
  * drifts between the Spark plan and the oracle SQL hash-mismatches even
  * when every value is identical. This spec catches that class without
  * running a single query: schemas come from analysis only (no actions).
  */
class CatalogContractSpec extends SparkSpec {

  private lazy val entries = SparkEntry.queries.keys.toSeq.sorted

  test("every catalog query analyzes and has distinct, lowercase column names") {
    val bad = entries.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf0001).schema
      val cols = schema.fieldNames.toSeq
      val dups = cols.groupBy(identity).collect { case (c, g) if g.size > 1 => c }
      val upper = cols.filter(c => c != c.toLowerCase)
      (if (dups.nonEmpty) Seq(s"$name: duplicate columns $dups") else Nil) ++
        (if (upper.nonEmpty) Seq(s"$name: non-lowercase columns $upper") else Nil)
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("every output column name appears verbatim in its oracle SQL") {
    // the driver sorts columns by name before hashing — a Spark column the
    // SQL never aliases is the classic silent hash-mismatch
    val bad = entries.flatMap { name =>
      SparkEntry.oracleSql.get(name).toSeq.flatMap { sql =>
        val sqlLower = sql.toLowerCase
        val schema = SparkEntry.queries(name)(spark, sf0001).schema
        schema.fieldNames.filterNot { c =>
          java.util.regex.Pattern.compile("\\b" + java.util.regex.Pattern.quote(c.toLowerCase) + "\\b")
            .matcher(sqlLower).find()
        }.map(c => s"$name: column '$c' not found in oracle SQL")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("every oracle-checked entry has a query and vice versa (keys align)") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
