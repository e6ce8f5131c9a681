/* fastbin — native spike-event binning (host-side data loading hot path).
 *
 * Converts event-format spike data (times in seconds + neuron ids) into the
 * dense (T, N) count matrix the design-tensor pipeline consumes. For long
 * recordings (hours of events) the numpy scatter-add path is
 * allocation/indexing bound; this is a single linear pass.
 *
 * Built lazily by utils/binning.py with the system C compiler and loaded via
 * ctypes (no Python API dependency). The reference has no native code at all
 * (SURVEY.md §2); this is the one host-side runtime piece where native pays.
 */

void bin_events(const double *times, const long long *neurons,
                long long n_events, double dt, long long T, long long N,
                float *out /* (T*N), zero-initialized by the caller */) {
    const double inv_dt = 1.0 / dt;
    for (long long i = 0; i < n_events; ++i) {
        long long t = (long long)(times[i] * inv_dt);
        long long n = neurons[i];
        if (t >= 0 && t < T && n >= 0 && n < N) {
            out[t * N + n] += 1.0f;
        }
    }
}

/* Sparse (indices of nonzero bins) -> dense, for pre-binned sparse inputs. */
void scatter_counts(const long long *bin_idx, const long long *neuron_idx,
                    const float *counts, long long nnz, long long T,
                    long long N, float *out) {
    for (long long i = 0; i < nnz; ++i) {
        long long t = bin_idx[i];
        long long n = neuron_idx[i];
        if (t >= 0 && t < T && n >= 0 && n < N) {
            out[t * N + n] += counts[i];
        }
    }
}
