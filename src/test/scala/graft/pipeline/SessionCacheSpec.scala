package graft.pipeline

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class SessionCacheSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.Sessions.builder("2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("builds once per key, even under concurrent first access") {
    val builds = new AtomicInteger(0)
    val key = s"spec:${System.nanoTime()}"
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        val df = SessionCache.getOrPersist(spark, key) {
          builds.incrementAndGet()
          spark.range(10).toDF()
        }
        assert(df.count() == 10)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get() == 1, "the builder must run exactly once")
    // The returned frame is persisted.
    val again = SessionCache.getOrPersist(spark, key)(fail("must not rebuild"))
    assert(again.storageLevel.useMemory || again.storageLevel.useDisk)
  }

  test("distinct keys build independently") {
    val a = SessionCache.getOrPersist(spark, s"a:${System.nanoTime()}")(spark.range(3).toDF())
    val b = SessionCache.getOrPersist(spark, s"b:${System.nanoTime()}")(spark.range(5).toDF())
    assert(a.count() == 3 && b.count() == 5)
  }
}
