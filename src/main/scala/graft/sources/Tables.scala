package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-aware loaders for the driver-generated star schema
  * (TESTDATA.md). Each loader reads exactly one parquet file under the
  * scale-factor dir passed by the driver; column pruning and filter
  * pushdown happen in the caller's plan and reach the scan because these
  * are plain parquet relations (verified via `.explain("formatted")`:
  * `PushedFilters`/`ReadSchema`).
  *
  * Capability mapping (public MorphL churning-users pipeline): `events`
  * plays the Google-Analytics hit/session stream the reference ingests;
  * `customer`/`orders` play its user/transaction dimensions.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = read(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Reading it as a raw nanos-since-epoch LONG
    * (legacy conf) is also the better call for oracle parity: integer
    * nanos → exact integer second/day arithmetic on both engines, no
    * sub-second truncation mismatches (DuckDB keeps ns, Spark µs).
    * Downstream ops derive `epoch_s = ts_ns div 1e9`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame  = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
