package graft.streaming

/** Streaming `{href}` resolution (reference app36; pincette-jes resolves
  * against the MongoDB aggregate collection): a run-scoped latest-state
  * map fed by the aggregate purpose stream, read by reducers at reduce
  * time through `AggregateLogic.Config.resolver`.
  *
  * Local-mode/test implementation: one JVM-wide store keyed by run id —
  * executor task closures deserialize `Resolver` and reach the same
  * singleton (same-JVM local mode). A multi-JVM cluster plugs an external
  * serving store behind the same `String => Option[String]` hook, exactly
  * as the reference queries Mongo from each instance.
  */
object HrefStore {

  private val stores = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, (Long, String)]]()

  private def store(run: String) =
    stores.computeIfAbsent(run,
      _ => new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]())

  /** Keep the latest state per aggregate id (highest `_seq` wins). */
  def put(run: String, id: String, seq: Long, json: String): Unit =
    store(run).merge(id, (seq, json),
      (a, b) => if (b._1 >= a._1) b else a)

  def get(run: String, id: String): Option[String] =
    Option(store(run).get(id)).map(_._2)

  def clear(run: String): Unit = stores.remove(run)

  /** Serializable resolver handle for `AggregateLogic.Config.resolver`. */
  final case class Resolver(run: String)
      extends (String => Option[String]) with Serializable {
    def apply(id: String): Option[String] = get(run, id)
  }
}
