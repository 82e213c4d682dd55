package graft.tools
import org.apache.spark.sql.functions._

/** Dev-only: attribute the rarity cold path after the TokenRuns kernel —
  * raw kernel scan vs cache materialization vs the old HOF formulation,
  * so a regression is located, not guessed.
  */
object ProbeTokenRuns {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    import org.apache.spark.sql.GraftSql
    def docs = graft.Tables.spread(graft.Tables.documents(spark, dir))

    // (a) kernel scan, NO cache: how fast is the walk itself?
    val kern = docs.select(col("doc_id"), GraftSql.column(
      graft.functions.TokenRuns(GraftSql.expression(col("text")))).as("runs"))
    Prof.time("kernel scan + explode count (uncached)")(
      kern.select(explode(col("runs"))).count())

    // (b) kernel scan through a Spark cache (the production shape).
    val cached = kern.cache()
    Prof.time("kernel cache build (count)")(cached.count())
    Prof.time("explode over cached runs")(
      cached.select(explode(col("runs"))).count())
    cached.unpersist(true)

    // (c) the old HOF formulation, uncached, for the same count.
    val s = col("s")
    val starts = col("starts")
    val runs = transform(sequence(lit(1), size(starts)), j =>
      struct(
        element_at(s, element_at(starts, j)).as("tok"),
        (coalesce(try_element_at(starts, j + 1), size(s) + 1) -
          element_at(starts, j)).cast("long").as("c")))
    val hof = docs
      .select(col("doc_id"), array_sort(split(trim(lower(col("text"))), "\\s+")).as("s"))
      .select(col("doc_id"), s, filter(sequence(lit(1), size(s)), i =>
        (i === 1) || element_at(s, i) =!= element_at(s, i - 1)).as("starts"))
      .select(col("doc_id"), runs.as("runs"))
    Prof.time("HOF scan + explode count (uncached)")(
      hof.select(explode(col("runs"))).count())

    spark.stop()
  }
}
