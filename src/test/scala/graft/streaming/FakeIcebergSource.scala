package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** TEST DOUBLE for the Iceberg data source (test classpath only).
  *
  * No Iceberg runtime jar exists in the offline build, so the real
  * format can never resolve here. This source registers the SHORT NAME
  * "iceberg" through Spark's standard DataSourceRegister ServiceLoader
  * hook (src/test/resources/META-INF/services/...), which makes
  * [[IcebergSink.write]]'s whole chain executable in tests: format
  * resolution by name, the verbatim option chain, partitionBy, and the
  * create-or-append branch all run through Spark's real write path and
  * are captured here for assertion. It does NOT imitate Iceberg
  * semantics (no snapshots, no CoW) — it only proves our side of the
  * contract: exactly what the sink hands Spark. The prod bring-up that
  * swaps this for the real runtime is documented in ICEBERG.md.
  */
object FakeIcebergSource {
  final case class Capture(mode: SaveMode, options: Map[String, String],
    schema: StructType, rows: Long)
  @volatile var captures: List[Capture] = Nil
  def reset(): Unit = captures = Nil
}

class FakeIcebergSource extends CreatableRelationProvider
    with RelationProvider with DataSourceRegister {

  override def shortName(): String = "iceberg"

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    FakeIcebergSource.captures ::=
      FakeIcebergSource.Capture(mode, parameters, data.schema, data.count())
    createRelation(ctx, parameters)
  }

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = new BaseRelation {
    override def sqlContext: SQLContext = ctx
    override def schema: StructType =
      FakeIcebergSource.captures.headOption.map(_.schema)
        .getOrElse(StructType(Nil))
  }
}
