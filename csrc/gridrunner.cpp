// alan-grid: native experiment-grid executor.
//
// The reference drives its K x lr x method x run experiment grids from shell
// scripts + a Python try/except loop that appends to a job_status text file
// (reference examples/runner.py:204-213, examples/run_*.sh).  This native
// executor supervises the grid: bounded parallelism, per-job timeout,
// retries, and a machine-readable status file for failure detection and
// resume (jobs already marked ok are skipped on re-run).
//
// Usage:
//   alan-grid [-j N] [-t TIMEOUT_S] [-r RETRIES] -s STATUS_FILE CMDFILE
// where CMDFILE has one shell command per line ('#' comments allowed).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <functional>
#include <iostream>
#include <mutex>
#include <set>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include <sys/types.h>
#include <sys/wait.h>
#include <signal.h>
#include <unistd.h>

namespace {

struct Job {
  int id;
  std::string cmd;
};

std::mutex g_mu;

std::string now() {
  char buf[64];
  std::time_t t = std::time(nullptr);
  std::strftime(buf, sizeof buf, "%Y-%m-%dT%H:%M:%S", std::localtime(&t));
  return buf;
}

// Run a command with a timeout; kill its whole process group on expiry.
int run_with_timeout(const std::string& cmd, int timeout_s) {
  pid_t pid = fork();
  if (pid < 0) return -1;
  if (pid == 0) {
    setpgid(0, 0);
    execl("/bin/sh", "sh", "-c", cmd.c_str(), (char*)nullptr);
    _exit(127);
  }
  setpgid(pid, pid);

  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::seconds(timeout_s);
  int status = 0;
  while (true) {
    pid_t r = waitpid(pid, &status, WNOHANG);
    if (r == pid) break;
    if (r < 0) return -1;
    if (std::chrono::steady_clock::now() > deadline) {
      // kill exactly the job's process group (never by name/pattern)
      kill(-pid, SIGKILL);
      waitpid(pid, &status, 0);
      return 124;
    }
    std::this_thread::sleep_for(std::chrono::milliseconds(200));
  }
  if (WIFEXITED(status)) return WEXITSTATUS(status);
  if (WIFSIGNALED(status)) return 128 + WTERMSIG(status);
  return -1;
}

}  // namespace

int main(int argc, char** argv) {
  int jobs = 2, timeout_s = 7200, retries = 1;
  std::string status_path = "job_status.tsv";
  std::string cmdfile;

  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "-j" && i + 1 < argc) jobs = atoi(argv[++i]);
    else if (a == "-t" && i + 1 < argc) timeout_s = atoi(argv[++i]);
    else if (a == "-r" && i + 1 < argc) retries = atoi(argv[++i]);
    else if (a == "-s" && i + 1 < argc) status_path = argv[++i];
    else cmdfile = a;
  }
  if (cmdfile.empty()) {
    std::cerr << "usage: alan-grid [-j N] [-t TIMEOUT_S] [-r RETRIES] "
                 "[-s STATUS] CMDFILE\n";
    return 2;
  }

  std::vector<Job> all;
  {
    std::ifstream in(cmdfile);
    std::string line;
    int id = 0;
    while (std::getline(in, line)) {
      if (line.empty() || line[0] == '#') continue;
      all.push_back({id++, line});
    }
  }

  // resume: collect job ids already ok in the status file
  std::set<int> done;
  {
    std::ifstream st(status_path);
    std::string line;
    while (std::getline(st, line)) {
      std::istringstream ss(line);
      std::string ts, state; int id;
      if (ss >> ts >> id >> state && state == "ok") done.insert(id);
    }
  }

  std::ofstream st(status_path, std::ios::app);
  std::atomic<size_t> next{0};
  std::atomic<int> failures{0};

  auto worker = [&]() {
    while (true) {
      size_t i = next.fetch_add(1);
      if (i >= all.size()) return;
      const Job& j = all[i];
      if (done.count(j.id)) continue;
      int rc = -1;
      for (int attempt = 0; attempt <= retries; ++attempt) {
        {
          std::lock_guard<std::mutex> lk(g_mu);
          st << now() << "\t" << j.id << "\trunning\tattempt=" << attempt
             << "\t" << j.cmd << "\n" << std::flush;
        }
        rc = run_with_timeout(j.cmd, timeout_s);
        if (rc == 0) break;
      }
      std::lock_guard<std::mutex> lk(g_mu);
      st << now() << "\t" << j.id << "\t" << (rc == 0 ? "ok" : "failed")
         << "\trc=" << rc << "\t" << j.cmd << "\n" << std::flush;
      if (rc != 0) failures++;
    }
  };

  std::vector<std::thread> pool;
  for (int i = 0; i < jobs; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();

  std::cerr << "alan-grid: " << all.size() << " jobs, " << failures
            << " failed\n";
  return failures == 0 ? 0 : 1;
}
