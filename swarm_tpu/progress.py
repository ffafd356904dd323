"""Progress reporting (reference: src/utils/progress.cc).

Two modes, chosen by whether -l redirects logging to a file:
 - stderr mode: "<prompt> 0%" at init, "  \\r<prompt> NN%" at milestones
   (200 steps), "  \\r<prompt> 100%\\n" when done;
 - logfile mode: "<prompt>" at init, " 100%\\n" when done (no updates).
"""

GRANULARITY = 200


class Progress:
    def __init__(self, logfile, log_to_file: bool):
        self.logfile = logfile
        self.log_to_file = log_to_file
        self.prompt = ""
        self.size = 0
        self.chunk = 1
        self.next = 1

    def init(self, prompt: str, size: int) -> None:
        self.prompt = prompt
        self.size = size
        self.chunk = 1 if size < GRANULARITY else size // GRANULARITY
        self.next = 1
        if self.log_to_file:
            self.logfile.write(prompt)
        else:
            self.logfile.write(f"{prompt} 0%")

    def update(self, progress: int) -> None:
        if self.log_to_file:
            return
        if progress < self.next:
            return
        pct = 100.0 * progress / self.size if self.size else 100.0
        self.logfile.write(f"  \r{self.prompt} {pct:.0f}%")
        self.next = progress + self.chunk
        self.logfile.flush()

    def done(self) -> None:
        if self.log_to_file:
            self.logfile.write(" 100%\n")
        else:
            self.logfile.write(f"  \r{self.prompt} 100%\n")
        self.logfile.flush()
