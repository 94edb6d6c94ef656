package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.io.S3
import org.scalatest.funsuite.AnyFunSuite

/** LIVE MinIO/S3 integration for the object-store sink (reference
  * `compose.yml:19-21`, `src/utils.py:138-147`, 16 MB multipart at
  * `src/core.py:947`): the from-spec SigV4 client is pinned against AWS's
  * published vectors and an embedded HTTP stub in `S3ClientSpec`; this
  * spec drives the SAME client against a real server when the env names
  * one.
  *
  * ENV-GATED: set `GRAFT_S3_ENDPOINT` (e.g. `http://127.0.0.1:9000`),
  * `GRAFT_S3_ACCESS`, `GRAFT_S3_SECRET` (and optionally `GRAFT_S3_REGION`,
  * default us-east-1) and every test runs live; unset, each test cancels
  * (reported as canceled, never green-by-skip).
  */
class MinioLiveSpec extends AnyFunSuite {

  private def cfg: S3.Config = {
    val ep = sys.env.get("GRAFT_S3_ENDPOINT")
    assume(ep.isDefined, "GRAFT_S3_ENDPOINT not set — live-MinIO spec canceled")
    S3.Config(ep.get,
      sys.env.getOrElse("GRAFT_S3_REGION", "us-east-1"),
      sys.env.getOrElse("GRAFT_S3_ACCESS",
        fail("GRAFT_S3_ACCESS required with GRAFT_S3_ENDPOINT")),
      sys.env.getOrElse("GRAFT_S3_SECRET",
        fail("GRAFT_S3_SECRET required with GRAFT_S3_ENDPOINT")))
  }

  test("live MinIO: bucket ensure (twice), simple put, byte-exact get-back") {
    val client = new S3.S3Client(cfg)
    client.ensureBucket("graft-live-probe")
    client.ensureBucket("graft-live-probe") // 409 path is success
    val payload = "hello from graft\n".getBytes(UTF_8)
    // key with a space exercises the segment encoding on a real server
    client.put("graft-live-probe", "dir x/small.txt", payload, "text/plain")
    assert(client.get("graft-live-probe", "dir x/small.txt").toSeq == payload.toSeq)
  }

  test("live MinIO: multipart round-trip over the 16 MB threshold, overwrite idempotence") {
    val client = new S3.S3Client(cfg)
    client.ensureBucket("graft-live-probe")
    // 17 MiB of deterministic bytes → two parts at the 16 MB default
    val payload = Array.tabulate(17 * 1024 * 1024)(i => (i * 31 + 7).toByte)
    client.put("graft-live-probe", "big/multipart.bin", payload,
      "application/octet-stream")
    val back = client.get("graft-live-probe", "big/multipart.bin")
    assert(back.length == payload.length)
    assert(java.util.Arrays.equals(back, payload), "byte-exact multipart round trip")
    // deterministic-key overwrite (the ObjectStore retry contract)
    client.put("graft-live-probe", "big/multipart.bin", payload,
      "application/octet-stream")
    assert(client.get("graft-live-probe", "big/multipart.bin").length == payload.length)
  }
}
