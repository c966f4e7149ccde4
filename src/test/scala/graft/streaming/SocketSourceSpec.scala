package graft.streaming

import graft.SparkSpec

/** Socket text stream source (reference
  * StreamExecutionEnvironment.socketTextStream:1312): lines served by
  * a test-local server socket arrive as streaming rows. */
class SocketSourceSpec extends SparkSpec {
  test("socket source streams text lines") {
    val server = new java.net.ServerSocket(0)
    @volatile var writer: java.io.PrintWriter = null
    val acceptor = new Thread(() => {
      val s = server.accept()
      writer = new java.io.PrintWriter(s.getOutputStream, true)
    })
    acceptor.setDaemon(true)
    acceptor.start()
    val q = spark.readStream.format("socket")
      .option("host", "localhost").option("port", server.getLocalPort)
      .load()
      .writeStream.format("memory").queryName("sock1").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (writer == null && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(writer != null, "source never connected")
      writer.println("hello"); writer.println("world")
      var got = Set.empty[String]
      while (got != Set("hello", "world") &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        got = spark.table("sock1").collect().map(_.getString(0)).toSet
        if (got != Set("hello", "world")) Thread.sleep(100)
      }
      assert(got == Set("hello", "world"), s"received: $got")
    } finally { q.stop(); server.close() }
  }
}
