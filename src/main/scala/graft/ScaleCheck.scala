package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scaling probe: run the near-dedup cores on 1x / 4x / 10x copies
  * of the sf0.1 documents table (ids disambiguated per copy so dedup
  * structure is preserved, text perturbed per copy so the copies are
  * not trivial exact duplicates of each other).
  *
  *   runMain graft.ScaleCheck
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select($"doc_id", $"text")

    def inflate(times: Int) =
      (0 until times).map { c =>
        base.select(($"doc_id" + c * 1000000L).as("doc_id"),
          concat($"text", lit(s" copymark$c")).as("text"))
      }.reduce(_ unionAll _).localCheckpoint(true)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    Seq(1, 4, 10).foreach { times =>
      val docs = inflate(times)
      val n = docs.count()
      time(s"minhash ${n}docs") {
        graft.ext.MinHashLsh.nearDupPairs(docs, $"doc_id", $"text",
          n = 3, k = 64, bands = 16, threshold = 0.5,
          shingler = graft.ext.ShingleJaccard.wordShingles).count()
      }
      time(s"simhash ${n}docs") {
        graft.ext.SimHash.nearDupPairs(docs, $"doc_id", $"text",
          maxDist = 3, bands = 4).count()
      }
      time(s"exactdedup ${n}docs") {
        graft.ext.ExactDedup.byContentHash(docs, $"text", $"doc_id").count()
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
