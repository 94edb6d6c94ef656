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

  /** In-memory multipart-protocol stub: initiate returns an UploadId,
    * parts are stored by number with ETag echoes, complete verifies the
    * manifest and assembles the object; abort records itself. */
  private class MultipartStub {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val parts = new java.util.concurrent.ConcurrentHashMap[Int, Array[Byte]]()
    @volatile var assembled: Array[Byte] = _
    @volatile var completeXml: String = _
    @volatile var aborted = false
    @volatile var failPart: Int = -1
    val server: HttpServer =
      HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = ex.getRequestBody.readAllBytes()
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        def respond(status: Int, resp: Array[Byte]): Unit = {
          ex.sendResponseHeaders(status, if (resp.isEmpty) -1 else resp.length.toLong)
          if (resp.nonEmpty) ex.getResponseBody.write(resp)
          ex.close()
        }
        (ex.getRequestMethod, q) match {
          case ("POST", "uploads=") =>
            respond(200,
              "<InitiateMultipartUploadResult><UploadId>uid-77</UploadId></InitiateMultipartUploadResult>"
                .getBytes(UTF_8))
          case ("PUT", pq) if pq.contains("partNumber=") =>
            val n = "partNumber=(\\d+)".r.findFirstMatchIn(pq).get.group(1).toInt
            assert(pq == s"partNumber=$n&uploadId=uid-77", s"canonical query order: $pq")
            if (n == failPart) respond(500, Array.emptyByteArray)
            else {
              parts.put(n, body)
              ex.getResponseHeaders.add("ETag", "\"etag-" + n + "\"")
              respond(200, Array.emptyByteArray)
            }
          case ("POST", "uploadId=uid-77") =>
            completeXml = new String(body, UTF_8)
            import scala.jdk.CollectionConverters._
            assembled = parts.asScala.toSeq.sortBy(_._1).flatMap(_._2).toArray
            respond(200,
              "<CompleteMultipartUploadResult/>".getBytes(UTF_8))
          case ("DELETE", "uploadId=uid-77") =>
            aborted = true
            respond(204, Array.emptyByteArray)
          case other =>
            fail(s"unexpected request: $other")
        }
      }
    })
    server.start()
    def cfg(threshold: Int, partSize: Int): S3.Config =
      S3.Config(s"http://127.0.0.1:${server.getAddress.getPort}", "us-east-1",
        "ak", "sk", multipartThreshold = threshold, partSize = partSize)
  }

  test("multipart upload: threshold routing, part slicing, ETag manifest, byte-exact assembly") {
    val stub = new MultipartStub
    try {
      val client = new S3.S3Client(stub.cfg(threshold = 8, partSize = 4))
      val payload = (0 until 10).map(_.toByte).toArray
      // over the threshold → put() transparently multiparts
      client.put("bkt", "big/obj.bin", payload, "application/octet-stream")
      assert(stub.parts.size == 3, "10 bytes at partSize 4 → parts of 4,4,2")
      assert(stub.parts.get(1).length == 4 && stub.parts.get(3).length == 2)
      assert(stub.assembled.toSeq == payload.toSeq, "byte-exact reassembly")
      // the completion manifest echoes every ETag in part order
      assert(stub.completeXml ==
        "<CompleteMultipartUpload>" +
          "<Part><PartNumber>1</PartNumber><ETag>\"etag-1\"</ETag></Part>" +
          "<Part><PartNumber>2</PartNumber><ETag>\"etag-2\"</ETag></Part>" +
          "<Part><PartNumber>3</PartNumber><ETag>\"etag-3\"</ETag></Part>" +
          "</CompleteMultipartUpload>")
      assert(!stub.aborted)
    } finally stub.server.stop(0)
  }

  test("multipart upload: a failed part aborts the upload server-side, then rethrows") {
    val stub = new MultipartStub
    stub.failPart = 2
    try {
      val client = new S3.S3Client(stub.cfg(threshold = 1, partSize = 4))
      val e = intercept[IllegalArgumentException](
        client.put("bkt", "big/obj.bin", new Array[Byte](10), "application/octet-stream"))
      assert(e.getMessage.contains("part 2"))
      assert(stub.aborted, "AbortMultipartUpload must fire before rethrow")
    } finally stub.server.stop(0)
  }

  test("canonical query encoding: sorted pairs, RFC3986 values, valueless params keep '='") {
    assert(SigV4.canonicalQuery(Seq("uploads" -> "")) == "uploads=")
    assert(SigV4.canonicalQuery(
      Seq("uploadId" -> "a+b/c=", "partNumber" -> "2")) ==
      "partNumber=2&uploadId=a%2Bb%2Fc%3D")
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
