package graft.sources

import graft.SparkSpec
import graft.core.{GpsRecord, GpsSchema}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5-3: property-based round-trip — any record in the producer's
  * domains survives JSON serialization → schema'd read → typed Dataset
  * unchanged, including the EV fuel-null rule. (Raw ScalaCheck generators
  * sampled explicitly — the scalatest bridge artifact isn't in the offline
  * cache.) */
class GpsRoundTripSpec extends SparkSpec {

  private val genRecord: Gen[GpsRecord] = for {
    vid <- Gen.listOfN(8, Gen.hexChar).map(_.mkString.toLowerCase)
    lat <- Gen.chooseNum(-90.0, 90.0).map(v => math.rint(v * 1e6) / 1e6)
    lon <- Gen.chooseNum(-180.0, 180.0).map(v => math.rint(v * 1e6) / 1e6)
    speed <- Gen.chooseNum(0.0, 120.0).map(v => math.rint(v * 100) / 100)
    dir <- Gen.oneOf(GpsSchema.directions)
    isEv <- Gen.oneOf(true, false)
    fuel <- Gen.chooseNum(0.0, 100.0).map(v => math.rint(v * 100) / 100)
    batt <- Gen.chooseNum(10.0, 100.0).map(v => math.rint(v * 100) / 100)
    belt <- Gen.oneOf(GpsSchema.seatBeltStates)
    coll <- Gen.oneOf(true, false)
    brake <- Gen.oneOf(true, false)
    sec <- Gen.chooseNum(0L, 2000000000L)
  } yield GpsRecord(vid, lat, lon, speed, dir,
    if (isEv) None else Some(fuel), // producer:61-62 nullability rule
    batt, belt, coll, brake,
    java.time.Instant.ofEpochSecond(sec).toString.replace("T", " ").dropRight(1))

  test("JSON write -> schema'd read -> Dataset round-trips every field") {
    import spark.implicits._
    (1 to 10).foreach { trial =>
      val records = Gen.listOfN(20, genRecord)
        .apply(Gen.Parameters.default, Seed(trial.toLong))
        .getOrElse(fail(s"generator exhausted on trial $trial"))
      val dir = tmpDir("roundtrip")
      records.toDS().repartition(1).write.mode("overwrite").json(dir)
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".json")).map(_.getAbsolutePath).toSeq
      val back = JsonBatchReader.readGps(spark, files).as[GpsRecord].collect()
      assert(back.sortBy(r => (r.vehicle_id, r.timestamp, r.latitude)).toSeq ==
        records.sortBy(r => (r.vehicle_id, r.timestamp, r.latitude)),
        s"mismatch on trial $trial")
    }
  }
}
