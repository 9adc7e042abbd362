package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

/** S3-event envelope → file-URI list (SURVEY §2.1 S6).
  *
  * The reference receives S3 `ObjectCreated` notifications through SQS and
  * flattens each message body's `Records[].s3.{bucket.name, object.key}`
  * into `s3a://bucket/key` URIs, skipping messages whose payload has no
  * `Records` (spark-data-pipeline/spark_job.py:89-102). This is that parse
  * as a total, pure function — malformed bodies and missing fields degrade
  * to "no files" rather than throwing, matching the reference's
  * `payload.get('Records', [])` posture.
  */
object EnvelopeParser {

  /** File URIs named by one envelope body; Nil when the payload carries no
    * records (the reference's empty-batch skip, spark_job.py:94-96). */
  def fileUris(body: String, protocol: String = "s3a"): Seq[String] = {
    val parsed =
      try JsonMethods.parse(body)
      catch { case _: Exception => JNothing }
    parsed \ "Records" match {
      case JArray(records) =>
        records.flatMap { r =>
          (r \ "s3" \ "bucket" \ "name", r \ "s3" \ "object" \ "key") match {
            case (JString(bucket), JString(key)) => Some(s"$protocol://$bucket/$key")
            case _ => None
          }
        }
      case _ => Nil
    }
  }

  /** Flatten a batch of envelope bodies into one file list, preserving
    * arrival order (spark_job.py:89-102 `batch_files.extend`). */
  def batchFiles(bodies: Seq[String], protocol: String = "s3a"): Seq[String] =
    bodies.flatMap(fileUris(_, protocol))
}
