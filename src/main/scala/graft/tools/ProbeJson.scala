package graft.tools
import org.apache.spark.sql.functions._
object ProbeJson {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    val ev = graft.Tables.events(spark, dir)
    ev.select(col("props")).write.format("noop").mode("overwrite").save() // warm
    (1 to 2).foreach { i =>
      Prof.time(s"#$i scan only") {
        ev.select(col("event_type"), col("props")).write.format("noop").mode("overwrite").save()
      }
      Prof.time(s"#$i scan+groupBy(et,props)") {
        ev.groupBy(col("event_type"), col("props")).agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      Prof.time(s"#$i scan+parse only") {
        ev.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
          .write.format("noop").mode("overwrite").save()
      }
      Prof.time(s"#$i scan+lightagg(et)") {
        ev.select(col("event_type"), length(col("props")).as("k"))
          .groupBy(col("event_type")).agg(count(lit(1)), avg(col("k")), max(col("k")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
object ProbeJson2 {
  def main(args: Array[String]): Unit = {
    val spark = Prof.session()
    val dir = Prof.sfDir
    graft.operators.Relational.qJsonField(spark, dir).count() // warm
    (1 to 3).foreach { i =>
      Prof.time(s"#$i qJsonField.count")(
        graft.operators.Relational.qJsonField(spark, dir).count())
      Prof.time(s"#$i qJsonField.noop")(
        graft.operators.Relational.qJsonField(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
