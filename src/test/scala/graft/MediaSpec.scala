package graft

import graft.multimodal.Media
import graft.sim.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal binary-column plumbing: schema, determinism, ANN composition. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("media generation is deterministic across parallelism; binary payloads non-trivial") {
    val a = Media.generate(spark, 100, partitions = 2).collect().sortBy(_.media_id)
    val b = Media.generate(spark, 100, partitions = 16).collect().sortBy(_.media_id)
    a.zip(b).foreach { case (x, y) =>
      assert(x.kind == y.kind && java.util.Arrays.equals(x.bytes, y.bytes))
    }
    assert(a.map(_.kind).distinct.sorted.toSeq == Seq("audio", "image", "video"))
    assert(a.forall(_.bytes.length >= 256))
  }

  test("decode stub: images have 1 frame / 0 duration; videos have frames") {
    val d = Media.decode(Media.generate(spark, 200)).collect()
    assert(d.filter(_.kind == "image").forall(x => x.duration_ms == 0 && x.n_frames == 1))
    assert(d.filter(_.kind == "video").forall(_.n_frames > 0))
    assert(d.forall(x => x.width >= 64 && x.height >= 64))
  }

  test("feature extraction feeds ANN unchanged (array<float> schema)") {
    val feats = Media.features(Media.generate(spark, 300), dims = 16)
      .toDF().withColumnRenamed("media_id", "vec_id").withColumnRenamed("feature", "embedding")
    val top = Ann.bruteForceTopK(feats, feats.where(col("vec_id") < 3), k = 4)
    assert(top.count() == 12)
    assert(top.where(col("cos") > 1.000001 || col("cos") < -1.000001).isEmpty)
  }

  test("frame sampling emits every k-th frame per video") {
    val media = Media.generate(spark, 120)
    val frames = Media.sampleFrames(media, every = 50)
    val perVideo = frames.groupBy("media_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
    assert(perVideo.where(col("n") < 1).isEmpty)
    assert(frames.where(col("frame_idx") % 50 =!= 0).isEmpty)
  }
}
