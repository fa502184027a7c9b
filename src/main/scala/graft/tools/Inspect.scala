package graft.tools

import graft.Session
import graft.ingest.SchemaDetector

/** Dev tool: print a parquet file's schema, the detected pickup
  * columns, and a sample — the reference's inspect_parquet.py
  * (/root/reference/pivot_and_boostrap/inspect_parquet.py:1-47).
  *
  * Usage: runMain graft.tools.Inspect <path.parquet>
  */
object Inspect {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Inspect <path.parquet>")
    val spark = Session.get("graft-inspect")
    try {
      val df = spark.read.parquet(args(0))
      println(s"== ${args(0)}")
      df.printSchema()
      val cols = df.schema.fields.map(_.name).toSeq
      println(s"detected pickup datetime : ${SchemaDetector.findPickupDatetime(cols)}")
      println(s"detected pickup location : ${SchemaDetector.findPickupLocation(cols)}")
      println(s"detected lat/lon pair    : ${SchemaDetector.findLatLon(cols)}")
      df.show(5, truncate = 60)
    } finally spark.stop()
  }
}
