// Native continuous-batching scheduler core (C ABI, consumed via ctypes).
//
// TPU-native counterpart of the reference RequestManager's hot CPU path
// (/root/reference/src/runtime/request_manager.cc:713-1130
// prepare_next_batch: append sampled tokens, detect EOS / max-new-tokens /
// budget completion per request slot). The Python scheduler hands a fetched
// horizon ([n, B] sampled tokens) plus per-slot state to this core, which
// applies the whole horizon in one pass and reports which slots retired at
// which step — replacing an O(n*B) Python int() loop on the scheduling
// thread (the reference runs the same bookkeeping in C++ on a dedicated
// Legion CPU task).
//
// ABI (all int32, row-major):
//   ff_process_horizon(
//     tokens[n*B],           horizon tokens, tokens[i*B + slot]
//     n, b,
//     active[B],             1 = slot has a live request
//     out_counts[B],         tokens already produced per slot (in/out)
//     max_new[B],            per-slot max_new_tokens budget
//     total_lens[B],         prompt+output length per slot (in/out)
//     seq_budget[B],         retire when total + horizon_margin > budget
//     horizon_margin,
//     eos_ids[n_eos], n_eos,
//     stop_ids[B*max_stop], stop_counts[B], max_stop,   per-request stop sets
//     out_tokens[B*n],       accepted tokens per slot (compacted)
//     out_taken[B],          how many of the n tokens each slot accepted
//     out_finished[B])       1 = slot finished inside this horizon
// Returns number of finished slots.
extern "C" {

int ff_process_horizon(
    const int* tokens, int n, int b,
    const int* active,
    int* out_counts,
    const int* max_new,
    int* total_lens,
    const int* seq_budget,
    int horizon_margin,
    const int* eos_ids, int n_eos,
    const int* stop_ids, const int* stop_counts, int max_stop,
    int* out_tokens, int* out_taken, int* out_finished) {
  int finished = 0;
  for (int s = 0; s < b; ++s) {
    out_taken[s] = 0;
    out_finished[s] = 0;
    if (!active[s]) continue;
    for (int i = 0; i < n; ++i) {
      int tok = tokens[i * b + s];
      out_tokens[s * n + out_taken[s]] = tok;
      out_taken[s] += 1;
      out_counts[s] += 1;
      total_lens[s] += 1;
      bool stop = false;
      for (int e = 0; e < n_eos; ++e) {
        if (tok == eos_ids[e]) { stop = true; break; }
      }
      if (!stop) {
        for (int e = 0; e < stop_counts[s]; ++e) {
          if (tok == stop_ids[s * max_stop + e]) { stop = true; break; }
        }
      }
      if (!stop && out_counts[s] >= max_new[s]) stop = true;
      if (!stop && total_lens[s] + horizon_margin > seq_budget[s]) stop = true;
      if (stop) {
        out_finished[s] = 1;
        ++finished;
        break;
      }
    }
  }
  return finished;
}

}  // extern "C"
