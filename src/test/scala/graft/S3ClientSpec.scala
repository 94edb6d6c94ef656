package graft

import graft.io.S3
import graft.io.S3.SigV4
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** SigV4 signing math pinned against known-answer vectors cross-derived
  * with an independent implementation (python hashlib/hmac; the key
  * derivation and GET vectors are also the published AWS documentation
  * examples), plus a live HTTP round-trip against an embedded stub server
  * standing in for MinIO. */
class S3ClientSpec extends AnyFunSuite {

  test("signing-key derivation matches the published AWS example") {
    val k = SigV4.signingKey(
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "20150830", "us-east-1", "iam")
    assert(k.map("%02x".format(_)).mkString ==
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("full GET signature matches the published AWS example") {
    val cr = SigV4.canonicalRequest(
      "GET", "/", "Action=ListUsers&Version=2010-05-08",
      Seq(
        "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
        "host" -> "iam.amazonaws.com",
        "x-amz-date" -> "20150830T123600Z"),
      SigV4.sha256Hex(Array.emptyByteArray))
    assert(SigV4.sha256Hex(cr.getBytes(UTF_8)) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59",
      "canonical request canonicalization")
    val sts = SigV4.stringToSign("20150830T123600Z",
      "20150830/us-east-1/iam/aws4_request", cr)
    assert(SigV4.signature(
      "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY", "20150830", "us-east-1", "iam", sts) ==
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("S3 PUT signature with encoded path segments (cross-derived vector)") {
    val payloadHash = SigV4.sha256Hex("payload".getBytes(UTF_8))
    assert(payloadHash ==
      "239f59ed55e737c77147cf55ad0c1b030b6d7ee748a7426952f9b852d5a935e5")
    val uri = SigV4.canonicalUri("/bucket-a/dir x/file+1.bin")
    assert(uri == "/bucket-a/dir%20x/file%2B1.bin",
      "space and '+' must percent-encode per segment, '/' preserved")
    val cr = SigV4.canonicalRequest(
      "PUT", uri, "",
      Seq(
        "content-type" -> "application/octet-stream",
        "host" -> "localhost:9000",
        "x-amz-content-sha256" -> payloadHash,
        "x-amz-date" -> "20260813T120000Z"),
      payloadHash)
    val sts = SigV4.stringToSign("20260813T120000Z",
      "20260813/us-east-1/s3/aws4_request", cr)
    assert(SigV4.signature("secretkey", "20260813", "us-east-1", "s3", sts) ==
      "7fac92e96d73ec7023d2651262fdafa34d6ac6d2f3a61a8645a1440d0a5adf17")
  }

  test("client round-trip against an embedded stub: headers, body, 409 bucket") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val recorded = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Map[String, String], Array[Byte])]()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = ex.getRequestBody.readAllBytes()
        import scala.jdk.CollectionConverters._
        val headers = ex.getRequestHeaders.asScala.map { case (k, v) =>
          k.toLowerCase -> v.get(0) }.toMap
        recorded.add((ex.getRequestMethod, ex.getRequestURI.toString, headers, body))
        // second bucket PUT answers 409 (already exists)
        val status =
          if (ex.getRequestURI.toString == "/bkt" &&
            recorded.asScala.count(r => r._2 == "/bkt") > 1) 409 else 200
        ex.sendResponseHeaders(status, -1)
        ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val cfg = S3.Config(s"http://127.0.0.1:$port", "us-east-1", "ak", "sk")
      val client = new S3.S3Client(cfg)
      client.ensureBucket("bkt")
      client.ensureBucket("bkt") // 409 path must be accepted as success
      client.put("bkt", "res id/01 x.pdf", "hello".getBytes(UTF_8), "application/pdf")
      import scala.jdk.CollectionConverters._
      val reqs = recorded.asScala.toSeq
      assert(reqs.count(_._2 == "/bkt") == 2)
      val obj = reqs.find(_._2.startsWith("/bkt/")).get
      assert(obj._1 == "PUT")
      assert(obj._2 == "/bkt/res%20id/01%20x.pdf", "encoded segments on the wire")
      assert(new String(obj._4, UTF_8) == "hello")
      assert(obj._3("content-type") == "application/pdf")
      assert(obj._3("x-amz-content-sha256") == SigV4.sha256Hex("hello".getBytes(UTF_8)))
      val auth = obj._3("authorization")
      assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=ak/"))
      assert(auth.contains("/us-east-1/s3/aws4_request"))
      assert(auth.contains(
        "SignedHeaders=content-type;host;x-amz-content-sha256;x-amz-date"))
      assert("Signature=[0-9a-f]{64}$".r.findFirstIn(auth).isDefined)
    } finally server.stop(0)
  }

  test("put on a non-2xx response fails loudly") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        ex.sendResponseHeaders(403, -1); ex.close()
      }
    })
    server.start()
    try {
      val cfg = S3.Config(s"http://127.0.0.1:${server.getAddress.getPort}", "r", "a", "s")
      val client = new S3.S3Client(cfg)
      val e = intercept[IllegalArgumentException](
        client.put("b", "k", Array[Byte](1), "application/octet-stream"))
      assert(e.getMessage.contains("HTTP 403"))
    } finally server.stop(0)
  }
}
