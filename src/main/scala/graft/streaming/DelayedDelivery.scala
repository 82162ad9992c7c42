package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, ForeachWriter, Row}
import org.apache.spark.sql.functions._

/** `$delay` redelivery (docs/aggregation_stages.md:118-159): the stage
  * stamps `_topic` and `_delay_ms`; the SINK hands such rows to a timer
  * that re-produces them onto the target topic after the duration — the
  * reference's scheduled re-produce. Message order is not guaranteed and
  * loss is possible on a crash mid-delay, exactly the reference's caveat.
  */
object DelayedDelivery {

  /** One daemon timer pool per executor JVM. */
  lazy val pool: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newScheduledThreadPool(2, r => {
      val t = new Thread(r, "graft-delay")
      t.setDaemon(true)
      t
    })

  def schedule(delayMs: Long)(deliver: => Unit): Unit =
    pool.schedule(new Runnable {
      def run(): Unit =
        // the pool would silently swallow a throw; at-least-once loss on
        // failure is the reference's documented caveat, but it must be
        // VISIBLE loss
        try deliver
        catch {
          case e: Throwable =>
            System.err.println(s"graft $$delay redelivery failed: $e")
        }
    }, delayMs, java.util.concurrent.TimeUnit.MILLISECONDS)

  /** Does this part output carry `$delay` routing columns? */
  def hasDelay(df: DataFrame): Boolean = df.columns.contains("_delay_ms")

  /** Rows without a delay, routing columns dropped. */
  def immediate(df: DataFrame): DataFrame =
    df.filter(col("_delay_ms").isNull).drop("_delay_ms", "_topic")

  /** The delayed rows packed to (topic, delayMs, key, json). */
  def packedDelayed(df: DataFrame): DataFrame = {
    val payloadCols =
      df.columns.filterNot(Set("_delay_ms", "_topic")).map(col)
    val key =
      if (df.columns.contains("_id")) col("_id").cast("string")
      else lit(null).cast("string")
    df.filter(col("_delay_ms").isNotNull)
      .select(col("_topic").cast("string").as("topic"),
        col("_delay_ms").cast("long").as("delayMs"),
        key.as("key"), to_json(struct(payloadCols: _*)).as("json"))
  }

  /** ForeachWriter over `packedDelayed` rows: schedules `deliver` per row.
    * The transport must be serializable (executors run it).
    */
  final class Writer(deliver: (String, String, String) => Unit)
      extends ForeachWriter[Row] with Serializable {
    def open(partitionId: Long, epochId: Long): Boolean = true
    def process(r: Row): Unit = {
      val (topic, d, key, json) =
        (r.getString(0), r.getLong(1), r.getString(2), r.getString(3))
      schedule(d)(deliver(topic, key, json))
    }
    def close(errorOrNull: Throwable): Unit = ()
  }

  /** File-loopback transport: the redelivered message becomes a new file
    * in the topic's source directory, so the topic's file stream picks it
    * up like any other message (the test-Io analog of a Kafka produce).
    */
  final class FileTransport(root: String)
      extends ((String, String, String) => Unit) with Serializable {
    def apply(topic: String, key: String, json: String): Unit = {
      val dir = Paths.get(root, topic)
      Files.createDirectories(dir)
      // redeliveries sort AFTER the original messages: the file name's
      // digit suffix feeds the source's __ord (arrival-order) column
      val seq = FileTransport.counter.incrementAndGet()
      Files.writeString(
        dir.resolve(
          s"delay-${java.util.UUID.randomUUID().toString.take(8)}-$seq.json"),
        json, StandardOpenOption.CREATE)
    }
  }
  object FileTransport {
    private[DelayedDelivery] val counter =
      new java.util.concurrent.atomic.AtomicLong(1000000000L)
  }

  /** Kafka transport via reflection: kafka-clients is a runtime-only
    * dependency (exactly like the `format("kafka")` data source the
    * normal sink path uses). Producers are cached per bootstrap per JVM
    * (the companion map — deserialized copies share it). Each timer tick
    * CONFIRMS its send (flush + Future.get) before the tick is considered
    * done: a fire-and-forget send leaves the redelivery in the producer
    * buffer, where a hard executor crash (kill -9/OOM) silently drops it
    * after the timer already completed. The throw from a failed send
    * propagates to `schedule`'s catch — visible loss, per the reference's
    * at-least-once caveat. A JVM shutdown hook still flushes and closes
    * every cached producer for the graceful-exit path.
    */
  final class KafkaTransport(bootstrap: String)
      extends ((String, String, String) => Unit) with Serializable {
    def apply(topic: String, key: String, json: String): Unit = {
      val producer = KafkaTransport.producerFor(bootstrap)
      val recordCls =
        Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
      val record = recordCls
        .getConstructor(classOf[String], classOf[Object], classOf[Object])
        .newInstance(topic, key, json)
      val future = producer.getClass.getMethod("send", recordCls)
        .invoke(producer, record)
      producer.getClass.getMethod("flush").invoke(producer)
      // ack or throw — InvocationTargetException unwraps to the send
      // failure in schedule's visible-loss log
      try future.getClass.getMethod("get").invoke(future)
      catch {
        case e: java.lang.reflect.InvocationTargetException =>
          throw Option(e.getCause).getOrElse(e)
      }
    }
  }
  object KafkaTransport {
    private val producers =
      new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
    private[DelayedDelivery] def producerFor(bootstrap: String): AnyRef =
      producers.computeIfAbsent(bootstrap, b => {
        val props = new java.util.Properties()
        props.put("bootstrap.servers", b)
        props.put("key.serializer",
          "org.apache.kafka.common.serialization.StringSerializer")
        props.put("value.serializer",
          "org.apache.kafka.common.serialization.StringSerializer")
        val p = Class
          .forName("org.apache.kafka.clients.producer.KafkaProducer")
          .getConstructor(classOf[java.util.Properties])
          .newInstance(props).asInstanceOf[AnyRef]
        // drain in-flight redeliveries before the JVM exits
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try {
            p.getClass.getMethod("flush").invoke(p)
            p.getClass.getMethod("close").invoke(p)
          } catch { case _: Throwable => () },
          s"graft-delay-close-$b"))
        p
      })
  }
}
