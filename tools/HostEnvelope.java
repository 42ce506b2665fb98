import java.util.concurrent.*;
import java.util.*;

/**
 * Pure-JVM host-envelope microbenchmark (no Spark): measures what the
 * shared VM itself can express as thread-count scaling, so the engine's
 * local[N] -> local[4N] efficiencies can be read against the HOST ceiling
 * rather than an assumed-linear box (BASELINE.md "host envelope").
 *
 * Two fixed-TOTAL-work probes, each split across T threads:
 *  - alu:  xorshift64 iterations (register-resident, no memory traffic)
 *  - bw:   strided 64-bit reads over a shared 4 GiB working set
 *
 * Usage: java tools/HostEnvelope.java [alu_iters_total] [bw_gib]
 * Prints one JSON line: per-thread-count wall seconds + derived ceilings.
 */
public final class HostEnvelope {
  static long blackhole = 0;

  static double aluRun(int threads, long totalIters) throws Exception {
    ExecutorService ex = Executors.newFixedThreadPool(threads);
    long per = totalIters / threads;
    long t0 = System.nanoTime();
    List<Future<Long>> fs = new ArrayList<>();
    for (int t = 0; t < threads; t++) {
      final long seed = 0x9E3779B97F4A7C15L + t;
      fs.add(ex.submit(() -> {
        long x = seed, acc = 0;
        for (long i = 0; i < per; i++) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17;
          acc += x;
        }
        return acc;
      }));
    }
    for (Future<Long> f : fs) blackhole += f.get();
    ex.shutdown();
    return (System.nanoTime() - t0) / 1e9;
  }

  static double bwRun(int threads, long[] data) throws Exception {
    ExecutorService ex = Executors.newFixedThreadPool(threads);
    final int n = data.length;
    final int per = n / threads;
    long t0 = System.nanoTime();
    List<Future<Long>> fs = new ArrayList<>();
    for (int t = 0; t < threads; t++) {
      final int lo = t * per, hi = (t == threads - 1) ? n : (t + 1) * per;
      fs.add(ex.submit(() -> {
        long acc = 0;
        // stride 8 longs = one cache line per read: bandwidth-bound
        for (int s = 0; s < 8; s++)
          for (int i = lo + s; i < hi; i += 8) acc += data[i];
        return acc;
      }));
    }
    for (Future<Long> f : fs) blackhole += f.get();
    ex.shutdown();
    return (System.nanoTime() - t0) / 1e9;
  }

  public static void main(String[] args) throws Exception {
    long aluIters = args.length > 0 ? Long.parseLong(args[0]) : 40_000_000_000L;
    int bwGib = args.length > 1 ? Integer.parseInt(args[1]) : 4;
    int[] counts = {1, 2, 4, 8, 16, 32};

    long[] data = new long[bwGib << 27]; // gib * 2^30 / 8 bytes
    Random r = new Random(42);
    for (int i = 0; i < data.length; i += 4096) data[i] = r.nextLong();

    // warmup (JIT) then measure, best of 2 per count
    aluRun(8, aluIters / 20); bwRun(8, data);
    Map<Integer, Double> alu = new LinkedHashMap<>(), bw = new LinkedHashMap<>();
    for (int c : counts) {
      double a = Math.min(aluRun(c, aluIters), aluRun(c, aluIters));
      double b = Math.min(bwRun(c, data), bwRun(c, data));
      alu.put(c, a); bw.put(c, b);
      System.err.printf("[envelope] threads=%2d alu=%6.2fs bw=%6.2fs (%.1f GB/s)%n",
          c, a, b, bwGib * 8.0 / b);
    }
    // fixed-total-work: efficiency(N->4N) = wall(N) / (wall(4N) * 4)... for
    // fixed TOTAL work, ideal wall(4N) = wall(N)/4, so eff = wall(N)/(4*wall(4N))
    StringBuilder sb = new StringBuilder();
    sb.append("{\"bench\":\"host_envelope\",\"alu_sec\":{");
    int i = 0;
    for (int c : counts) sb.append(i++ > 0 ? "," : "").append('"').append(c).append("\":")
        .append(String.format(Locale.US, "%.2f", alu.get(c)));
    sb.append("},\"bw_sec\":{");
    i = 0;
    for (int c : counts) sb.append(i++ > 0 ? "," : "").append('"').append(c).append("\":")
        .append(String.format(Locale.US, "%.2f", bw.get(c)));
    sb.append(String.format(Locale.US,
        "},\"alu_eff_1_4\":%.3f,\"alu_eff_2_8\":%.3f,\"alu_eff_8_32\":%.3f," +
        "\"bw_eff_2_8\":%.3f,\"bw_eff_8_32\":%.3f}",
        alu.get(1) / (4 * alu.get(4)), alu.get(2) / (4 * alu.get(8)),
        alu.get(8) / (4 * alu.get(32)),
        bw.get(2) / (4 * bw.get(8)), bw.get(8) / (4 * bw.get(32))));
    System.out.println(sb);
  }
}
