package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the synthetic star-schema tables under a scale-factor dir
  * (`/root/testdata/sf*`). One parquet per table; Spark's vectorized
  * reader + Catalyst column pruning / filter pushdown do the heavy
  * lifting — callers should select only the columns they need so the
  * pushed `ReadSchema` stays narrow.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos via
    * the legacy conf and rebuild a TimestampType column with exact
    * integer division (`DIV`, not `/` — ns-since-epoch ≈ 1.7e18 exceeds
    * double's 2^53 integer range, so float division would corrupt it).
    * Sub-microsecond precision is dropped; date/hour/window semantics
    * are unaffected.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // nanosAsLong is set at session bootstrap (Session.builder); the
    // belt-and-braces set here covers sessions built elsewhere, scoped
    // check-then-set so an already-configured session is never mutated
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
