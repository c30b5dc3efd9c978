// Native I/O runtime for the TPU LBM framework.
//
// Role analog of the reference's ADIOS2 output engine + checkpoint writer
// (reference: adios_writer.hpp, checkpoint.h): field snapshots and
// checkpoint blobs are handed to a background thread pool, so the Python
// driver (and the TPU pipeline behind it) never blocks on disk.  Exposed to
// Python via a plain C ABI (ctypes) - see tnl_lbm_tpu/io/native.py.
//
// Build: g++ -O3 -march=native -shared -fPIC -o liblbm_io.so lbm_io.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Job {
    std::string path;
    std::string tmp_path;  // if non-empty: write to tmp then rename (atomic publish)
    std::vector<char> data;
};

class Writer {
  public:
    explicit Writer(int n_threads) : stop_(false) {
        for (int i = 0; i < n_threads; i++)
            threads_.emplace_back([this] { this->run(); });
    }

    ~Writer() { shutdown(); }

    void submit(Job&& job) {
        {
            std::lock_guard<std::mutex> lk(mu_);
            queue_.push_back(std::move(job));
            pending_++;
        }
        cv_.notify_one();
    }

    void flush() {
        std::unique_lock<std::mutex> lk(mu_);
        done_cv_.wait(lk, [this] { return pending_ == 0; });
    }

    void shutdown() {
        {
            std::lock_guard<std::mutex> lk(mu_);
            if (stop_) return;
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& t : threads_)
            if (t.joinable()) t.join();
    }

    uint64_t errors() const { return errors_.load(); }

  private:
    void run() {
        for (;;) {
            Job job;
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
                if (queue_.empty()) {
                    if (stop_) return;
                    continue;
                }
                job = std::move(queue_.front());
                queue_.pop_front();
            }
            const std::string& target = job.tmp_path.empty() ? job.path : job.tmp_path;
            FILE* fp = std::fopen(target.c_str(), "wb");
            bool ok = fp != nullptr;
            if (ok) {
                ok = std::fwrite(job.data.data(), 1, job.data.size(), fp) == job.data.size();
                ok = (std::fclose(fp) == 0) && ok;
            }
            if (ok && !job.tmp_path.empty())
                ok = std::rename(job.tmp_path.c_str(), job.path.c_str()) == 0;
            if (!ok) errors_++;
            {
                std::lock_guard<std::mutex> lk(mu_);
                pending_--;
            }
            done_cv_.notify_all();
        }
    }

    std::mutex mu_;
    std::condition_variable cv_;
    std::condition_variable done_cv_;
    std::deque<Job> queue_;
    std::vector<std::thread> threads_;
    std::atomic<uint64_t> errors_{0};
    long pending_ = 0;
    bool stop_;
};

Writer* g_writer = nullptr;

}  // namespace

extern "C" {

// Initialize the background writer with n threads (idempotent).
void lbm_io_init(int n_threads) {
    if (!g_writer) g_writer = new Writer(n_threads > 0 ? n_threads : 2);
}

// Queue a raw blob write.  If atomic != 0, writes to <path>.tmp and renames.
void lbm_io_write(const char* path, const void* data, uint64_t size, int atomic) {
    if (!g_writer) lbm_io_init(2);
    Job job;
    job.path = path;
    if (atomic) job.tmp_path = std::string(path) + ".tmp";
    job.data.assign(static_cast<const char*>(data), static_cast<const char*>(data) + size);
    g_writer->submit(std::move(job));
}

// Assemble a VTI appended-data payload in native code: the XML header is
// followed by `count` blobs, each prefixed with its uint64 byte length
// (ParaView AppendedData raw encoding), then the footer.  Avoids building
// multi-hundred-MB Python bytes objects on the driver thread.
void lbm_io_write_vti(
    const char* path,
    const char* header, uint64_t header_len,
    const char* footer, uint64_t footer_len,
    const void** blobs, const uint64_t* blob_sizes, int count,
    int atomic
) {
    if (!g_writer) lbm_io_init(2);
    Job job;
    job.path = path;
    if (atomic) job.tmp_path = std::string(path) + ".tmp";
    uint64_t total = header_len + footer_len;
    for (int i = 0; i < count; i++) total += 8 + blob_sizes[i];
    job.data.reserve(total);
    job.data.insert(job.data.end(), header, header + header_len);
    for (int i = 0; i < count; i++) {
        uint64_t n = blob_sizes[i];
        const char* le = reinterpret_cast<const char*>(&n);  // little-endian hosts
        job.data.insert(job.data.end(), le, le + 8);
        const char* p = static_cast<const char*>(blobs[i]);
        job.data.insert(job.data.end(), p, p + n);
    }
    job.data.insert(job.data.end(), footer, footer + footer_len);
    g_writer->submit(std::move(job));
}

// Block until all queued writes hit the filesystem.
void lbm_io_flush() {
    if (g_writer) g_writer->flush();
}

// Number of failed writes since init.
uint64_t lbm_io_errors() {
    return g_writer ? g_writer->errors() : 0;
}

void lbm_io_shutdown() {
    if (g_writer) {
        g_writer->flush();
        g_writer->shutdown();
    }
}

}  // extern "C"
