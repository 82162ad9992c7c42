package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Production `fromCollection` bridge: the reference consumes MongoDB
  * change streams with resume tokens (App.java:650-683, 1056-1081). The
  * Spark-native equivalent is a Kafka CDC topic (Debezium-style
  * envelopes) — resume semantics come from Kafka offsets + the streaming
  * checkpoint, replacing the reference's persisted resume tokens.
  *
  * `unwrap` turns envelopes into the collection's message stream:
  * create/update/read become the full document (change-stream
  * fullDocument semantics), delete becomes `{_id, _deleted: true}` — the
  * same shape the reference's `$delete`-handling sinks consume.
  */
object Cdc {

  /** (key, value) envelope frame → (key, value) document frame. Accepts
    * both payload-wrapped (`{payload: {op, before, after}}`) and
    * flattened (`{op, before, after}`) envelopes; `after`/`before` may be
    * embedded objects or JSON-string fields (the Mongo connector emits
    * strings).
    */
  def unwrap(df: DataFrame): DataFrame = {
    def field(name: String) = coalesce(
      get_json_object(col("value"), s"$$.payload.$name"),
      get_json_object(col("value"), s"$$.$name"))
    // a JSON-string after/before arrives quote-escaped; get_json_object
    // already unescapes one level, so the result is the document text
    val op = field("op")
    val after = field("after")
    val before = field("before")
    val afterId = get_json_object(after, "$._id")
    val beforeId = get_json_object(before, "$._id")
    // a delete without a pre-image (default Debezium Mongo config: no
    // `before` document) carries the id only in the KEY — fall back to
    // the Debezium key envelope ({payload:{id}}, {id}) or the raw key,
    // or the {_id,_deleted:true} marker would have no _id at all and the
    // delete would be lost downstream
    val keyId = coalesce(
      get_json_object(col("key"), "$.payload.id"),
      get_json_object(col("key"), "$.id"),
      col("key"))
    val deleted = to_json(struct(coalesce(beforeId, keyId).as("_id"),
      lit(true).as("_deleted")))
    val ordCols =
      if (df.columns.contains("__ord")) Seq(col("__ord")) else Nil
    df.select(Seq(
      coalesce(afterId, beforeId, col("key")).as("key"),
      when(op === "d", deleted).otherwise(after).as("value")) ++ ordCols: _*)
      .where(col("value").isNotNull)
  }
}
