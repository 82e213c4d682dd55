package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profile of the shingle build (not part of the contract). */
object ProfileShingles {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = graft.Tables.documents(spark, dir)
    t("raw count")(docs.count())
    t("raw count again")(docs.count())
    val spreadDf = t("spread() construction")(graft.Tables.spread(docs))
    t("spread count")(spreadDf.count())
    val tk = spreadDf.select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("tk"))
    t("tokenize count")(tk.count())
    val grams = tk.select(col("doc_id"),
      explode(array_distinct(
        when(size(col("tk")) < 3, array().cast("array<long>"))
          .otherwise(transform(sequence(lit(1), size(col("tk")) - 2),
            i => xxhash64(concat_ws(" ", element_at(col("tk"), i),
              element_at(col("tk"), i + 1), element_at(col("tk"), i + 2))))))).as("gh"))
    t("grams count (no cache)")(println("  rows=" + grams.count()))
    t("grams count again")(grams.count())
    val cached = grams.cache()
    t("cache materialize")(cached.count())
    t("cached count")(cached.count())
    spark.stop()
  }
}
