package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asset table: binary payload + struct metadata schema") {
    val df = Multimodal.assetTable(spark, sf)
    val sch = df.schema
    assert(sch("media").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    assert(df.select($"meta.format").distinct().count() == 3)
    assert(df.count() > 0)
  }

  test("feature extraction: deterministic, fixed-dim, one row per asset") {
    val a = Multimodal.assets(spark, sf)
    val f1 = Multimodal.extractFeatures(a, dim = 16)
    assert(f1.count() == a.count())
    val r = f1.filter($"asset_id" === 0).collect()(0)
    assert(r.features.length == 16)
    assert(r.features.forall(v => v >= 0.0f && v <= 1.0f))
    // deterministic: recompute gives identical features
    val r2 = Multimodal.extractFeatures(a, dim = 16).filter($"asset_id" === 0).collect()(0)
    assert(r.features.sameElements(r2.features))
    // payload length is carried through
    assert(r.n_bytes > 0)
  }

  test("feature extraction preserves partitioning (no shuffle)") {
    val a = Multimodal.assets(spark, sf).repartition(3)
    val f = Multimodal.extractFeatures(a, dim = 8)
    assert(f.rdd.getNumPartitions == 3)
    // exactly one Exchange — the explicit repartition above; extractFeatures
    // itself must add none (narrow mapPartitions)
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, "mapPartitions stage must not shuffle")
  }

  test("resize updates metadata for every asset") {
    val a = Multimodal.assets(spark, sf)
    val r = Multimodal.resize(a, 128, 128)
    assert(r.filter($"width" =!= 128 || $"height" =!= 128).count() == 0)
    assert(r.count() == a.count())
  }

  test("frame sampling explodes to n frames per asset with sliced bytes") {
    val a = Multimodal.assets(spark, sf).limit(10)
    val frames = Multimodal.frameSample(a, nFrames = 4)
    assert(frames.count() == 40)
    val byAsset = frames.groupBy("asset_id").count().collect()
    assert(byAsset.forall(_.getLong(1) == 4))
    val f0 = frames.filter($"asset_id" === 0 && $"frame_idx" === 0).collect()(0)
    assert(f0.frame_bytes.nonEmpty)
  }
}
