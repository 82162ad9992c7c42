package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.op.Pipeline
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ ExprQueries.all ++ MlQueries.all ++ OpsQueries.all ++
      AggregateQueries.all ++ Round4Queries.all ++ Round5Queries.all ++
      Round6Queries.all ++ CurationQueries.all ++ Round8Queries.all ++
      Round9Queries.all ++ Round10Queries.all ++ Round11Queries.all ++
      Round12Queries.all ++ Round13Queries.all ++ Round14Queries.all ++
      WordPieceQueries.all ++ SketchQueries.all ++ Round16Queries.all ++
      Round17Queries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * revenue by order priority for high-discount lineitems —
    * $match → $lookup(unwind) → $group through the pipeline compiler.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    Q.session(spark)
    Pipeline.run(
      Tables.load(spark, sfDir, "lineitem"),
      """[{"$match":{"l_discount":{"$gte":0.05}}},
          {"$lookup":{"from":"orders","localField":"l_orderkey",
                      "foreignField":"o_orderkey","as":"ord","unwind":true}},
          {"$group":{"_id":"$ord.o_orderpriority",
            "revenue_cents":{"$sum":{"$toLong":{"$round":{"$multiply":
              [{"$multiply":["$l_extendedprice",{"$subtract":[1,"$l_discount"]}]},100]}}}},
            "n":{"$count":{}}}}]""",
      Tables.env(spark, sfDir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
