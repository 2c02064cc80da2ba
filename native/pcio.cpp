// pcio — native IO for plantcaduceus_tpu.
//
// Replaces the reference's samtools/bedtools C binaries (src/format_VCF.sh)
// and Biopython FASTA loading (src/zero_shot_score.py:176-180) on the hot
// data path: parse multi-gigabyte FASTA files and cut fixed-width,
// N-padded, upper-cased variant windows in bulk. Exposed through a plain C
// ABI consumed via ctypes (plantcaduceus_tpu/io/native.py).
//
// Window semantics match src/zero_shot_score.py:187-198 exactly:
//   window = seq[pos-center : pos+(len-center)) upper-cased,
//   rjust('N') at the chromosome start, ljust('N') at the end.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Fasta {
    std::vector<std::string> names;
    std::unordered_map<std::string, std::string> seqs;
};

inline char upper(char c) {
    return (c >= 'a' && c <= 'z') ? static_cast<char>(c - 32) : c;
}

}  // namespace

extern "C" {

// Load a FASTA file. Returns an opaque handle or nullptr on failure.
void* pcio_fasta_load(const char* path) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return nullptr;
    auto* fa = new Fasta();
    std::string name;
    std::string seq;
    std::vector<char> buf(1 << 20);
    std::string carry;
    auto flush = [&]() {
        if (!name.empty()) {
            fa->names.push_back(name);
            fa->seqs.emplace(name, std::move(seq));
            seq.clear();
        }
    };
    while (std::fgets(buf.data(), static_cast<int>(buf.size()), f)) {
        char* line = buf.data();
        size_t n = std::strlen(line);
        while (n && (line[n - 1] == '\n' || line[n - 1] == '\r')) --n;
        if (n == 0) continue;
        if (line[0] == '>') {
            flush();
            // name = first whitespace-delimited token after '>'
            size_t end = 1;
            while (end < n && line[end] != ' ' && line[end] != '\t') ++end;
            name.assign(line + 1, end - 1);
        } else {
            seq.append(line, n);
        }
    }
    flush();
    std::fclose(f);
    return fa;
}

void pcio_fasta_free(void* handle) {
    delete static_cast<Fasta*>(handle);
}

int64_t pcio_fasta_num_chroms(void* handle) {
    return static_cast<Fasta*>(handle)->names.size();
}

// Copy the i-th chromosome name into out (capacity cap). Returns its length.
int64_t pcio_fasta_chrom_name(void* handle, int64_t i, char* out, int64_t cap) {
    auto* fa = static_cast<Fasta*>(handle);
    if (i < 0 || i >= static_cast<int64_t>(fa->names.size())) return -1;
    const std::string& s = fa->names[static_cast<size_t>(i)];
    int64_t n = static_cast<int64_t>(s.size());
    if (out && cap > 0) std::memcpy(out, s.data(), static_cast<size_t>(n < cap ? n : cap));
    return n;
}

int64_t pcio_fasta_chrom_len(void* handle, const char* chrom) {
    auto* fa = static_cast<Fasta*>(handle);
    auto it = fa->seqs.find(chrom);
    return it == fa->seqs.end() ? -1 : static_cast<int64_t>(it->second.size());
}

// Extract n windows of width `window` centred (at `center`) on 0-based
// positions[i] of `chrom`, writing upper-cased chars into out (n*window
// bytes, row-major). Returns number of windows written, or -1 if the
// chromosome is unknown.
int64_t pcio_extract_windows(void* handle, const char* chrom,
                             const int64_t* positions, int64_t n,
                             int64_t window, int64_t center, char* out) {
    auto* fa = static_cast<Fasta*>(handle);
    auto it = fa->seqs.find(chrom);
    if (it == fa->seqs.end()) return -1;
    const std::string& seq = it->second;
    const int64_t L = static_cast<int64_t>(seq.size());
    const int64_t after = window - center;

    for (int64_t i = 0; i < n; ++i) {
        char* row = out + i * window;
        const int64_t pos = positions[i];
        int64_t lo = pos - center;
        int64_t hi = pos + after;  // exclusive
        if (lo < 0) {
            // rjust semantics (src/zero_shot_score.py:193): the slice
            // seq[0:hi] truncates at the chromosome end, then the WHOLE
            // result right-justifies — all padding goes on the left, even
            // when hi > L (short chromosome).
            int64_t m = (hi < L ? hi : L);
            int64_t pad = window - m;
            std::memset(row, 'N', static_cast<size_t>(pad));
            for (int64_t j = 0; j < m; ++j) row[pad + j] = upper(seq[static_cast<size_t>(j)]);
        } else {
            int64_t m = ((hi < L ? hi : L) - lo);
            if (m < 0) m = 0;
            for (int64_t j = 0; j < m; ++j)
                row[j] = upper(seq[static_cast<size_t>(lo + j)]);
            if (m < window)  // ljust: right-pad with N
                std::memset(row + m, 'N', static_cast<size_t>(window - m));
        }
    }
    return n;
}

// Bulk char->token-id encoding through a 256-entry lookup table.
void pcio_encode(const char* text, int64_t n, const int32_t* table,
                 int32_t* out) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = table[static_cast<uint8_t>(text[i])];
}

}  // extern "C"
