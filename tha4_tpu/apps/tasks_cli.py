"""tha4-tasks — list and run distillation tasks from the command line.

Headless equivalent of the reference's TaskSelectorUi (a Tkinter treeview,
reference: src/tha4/pytasuku/task_selector_ui.py): enumerate the task DAG of
a distillation config, show what is up to date, and run any task by name.

Examples:
  tha4-tasks --config_file jobs/mychar/config.yaml --list
  tha4-tasks --config_file jobs/mychar/config.yaml --run jobs/mychar/all
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--config_file", required=True)
    parser.add_argument("--list", action="store_true", help="list tasks and their status")
    parser.add_argument("--run", default=None, metavar="TASK", help="run one task (and its dependencies)")
    args = parser.parse_args(argv)

    from tha4_tpu.distiller.config import DistillerConfig
    from tha4_tpu.distiller.pipeline import DistillationJobs
    from tha4_tpu.tasks.workspace import FileTask, Workspace

    config = DistillerConfig.load(args.config_file)
    jobs = DistillationJobs(config)
    workspace = Workspace()
    jobs.define_tasks(workspace)

    if args.run:
        workspace.run(args.run)
        return 0

    # default: list
    for name in sorted(workspace.tasks):
        task = workspace.tasks[name]
        if isinstance(task, FileTask):
            status = "STALE" if task.needs_to_run() else "up to date"
        else:
            status = "command"
        print(f"{status:>10}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
