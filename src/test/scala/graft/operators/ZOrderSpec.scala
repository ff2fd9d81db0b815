package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleave produces the Morton curve index") {
    import spark.implicits._
    // (a=0b101, b=0b011) → bits a→even positions, b→odd: 0b011011 +
    // a bit2 at position 4 → 0b010111? compute by hand:
    // a=5(101): bits 0,2 set → z bits 0,4. b=3(011): bits 0,1 → z bits 1,3.
    // z = 1 + 2 + 8 + 16 = 27
    val row = Seq((5, 3)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 4).as("z"))
      .head.getLong(0)
    assert(row == 27L)
    val zero = Seq((0, 0)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 8).as("z")).head.getLong(0)
    assert(zero == 0L)
  }

  test("interleave is a bijection onto [0, 4^bits) — exhaustive at bits=4") {
    import spark.implicits._
    val pairs = for { a <- 0 until 16; b <- 0 until 16 } yield (a, b)
    val zs = pairs.toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.distinct.length == 256, "interleave collided")
    assert(zs.forall(z => z >= 0 && z < 256), "z out of range")
  }

  test("z-clustered layout prunes more files than a random layout for a box predicate") {
    val e = Tables.load(spark, sfDir, "events").select("event_id", "user_id", "value")
    val tmp = System.getProperty("java.io.tmpdir")
    val zPath = s"$tmp/graft_zorder_spec_z"
    val rPath = s"$tmp/graft_zorder_spec_r"
    ZOrder.cluster(e, "user_id", "value", bits = 8, numFiles = 16)
      .write.mode("overwrite").parquet(zPath)
    e.repartition(16).write.mode("overwrite").parquet(rPath)

    def overlapping(path: String): Long =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
             min("value").as("vlo"), max("value").as("vhi"))
        .filter(col("ulo") <= 6 && col("uhi") >= 2 &&
                col("vlo") <= 150 && col("vhi") >= 50)
        .count()

    val zTouched = overlapping(zPath)
    val rTouched = overlapping(rPath)
    assert(zTouched < rTouched,
      s"z-order should touch fewer files: z=$zTouched random=$rTouched")
    // random layout: every file spans the full value range → all overlap
    assert(rTouched == 16L)

    // layout must not change the result set
    val box = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("user_id").between(2, 6) && col("value").between(50, 150))
    val zRows = box(spark.read.parquet(zPath))
    val oRows = box(e)
    assert(zRows.exceptAll(oRows).isEmpty && oRows.exceptAll(zRows).isEmpty)
  }
}
