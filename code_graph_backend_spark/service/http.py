"""HTTP shell: the reference's 11 Flask routes over CodeGraphService.

Route-for-route parity with the reference API (reference api/index.py:
/graph_entities :53, /get_neighbors :97, /auto_complete :146,
/list_repos :184, /repo_info :205, /find_paths :250, /chat :305,
/analyze_folder :330, /analyze_repo :383, /switch_commit :419,
/list_commits :453), including its auth model: every route requires the
Authorization header to equal $SECRET_TOKEN (both-absent passes,
reference api/index.py:26-39), and the three repo-mutating routes
additionally require $CODE_GRAPH_PUBLIC=1 (reference api/index.py:43-51).

The Spark engine sits entirely behind CodeGraphService — this layer only
validates request shapes and maps results to the reference's response
envelopes ({'status': 'success', <key>: ...}).
"""

from __future__ import annotations

import os
from functools import wraps

from .api import CodeGraphService


def create_app(service: CodeGraphService):
    from flask import Flask, jsonify, request

    app = Flask("code_graph_backend_spark")

    def verify_token(token):
        secret = os.environ.get("SECRET_TOKEN")
        return token == secret or (token is None and secret is None)

    def token_required(f):
        @wraps(f)
        def wrapper(*args, **kwargs):
            if not verify_token(request.headers.get("Authorization")):
                return jsonify(message="Unauthorized"), 401
            return f(*args, **kwargs)
        return wrapper

    def public_access(f):
        @wraps(f)
        def wrapper(*args, **kwargs):
            if os.environ.get("CODE_GRAPH_PUBLIC", "0") != "1":
                return jsonify(message="Unauthorized"), 401
            return f(*args, **kwargs)
        return wrapper

    def graph_exists(repo: str) -> bool:
        from ..graph.model import PropertyGraph

        return PropertyGraph.exists(service.root, repo)

    @app.route("/graph_entities", methods=["GET"])
    @token_required
    def graph_entities():
        repo = request.args.get("repo")
        if not repo:
            return jsonify({"status": "Missing 'repo' parameter"}), 400
        if not graph_exists(repo):
            return jsonify({"status": f"Missing project {repo}"}), 400
        try:
            sub = service.graph_entities(repo, limit=500)
            return jsonify({"status": "success", "entities": sub}), 200
        except Exception:
            return jsonify({"status": "Internal server error"}), 500

    @app.route("/get_neighbors", methods=["POST"])
    @token_required
    def get_neighbors():
        data = request.get_json()
        repo, node_ids = data.get("repo"), data.get("node_ids")
        if not repo:
            return jsonify({"status": "Repository name is required."}), 400
        if not node_ids:
            return jsonify({"status": "Node IDs is required."}), 400
        if not graph_exists(repo):
            return jsonify({"status": f"Missing project {repo}"}), 400
        out = service.get_neighbors(repo, node_ids)
        return jsonify({"status": "success", "neighbors": out}), 200

    @app.route("/auto_complete", methods=["POST"])
    @token_required
    def auto_complete():
        data = request.get_json()
        repo, prefix = data.get("repo"), data.get("prefix")
        if repo is None:
            return jsonify({"status": 'Missing mandatory parameter "repo"'}), 400
        if prefix is None:
            return jsonify({"status": 'Missing mandatory parameter "prefix"'}), 400
        if not graph_exists(repo):
            return jsonify({"status": f"Missing project {repo}"}), 400
        out = service.auto_complete(repo, prefix)
        return jsonify({"status": "success", "completions": out}), 200

    @app.route("/list_repos", methods=["GET"])
    @token_required
    def list_repos():
        return jsonify({"status": "success", "repositories": service.list_repos()}), 200

    @app.route("/repo_info", methods=["POST"])
    @token_required
    def repo_info():
        data = request.get_json()
        repo = data.get("repo")
        if repo is None:
            return jsonify({"status": 'Missing mandatory parameter "repo"'}), 400
        if not graph_exists(repo):
            return jsonify({"status": f'Missing repository "{repo}"'}), 400
        return jsonify({"status": "success", "info": service.repo_info(repo)}), 200

    @app.route("/find_paths", methods=["POST"])
    @token_required
    def find_paths():
        data = request.get_json()
        repo = data.get("repo")
        if repo is None:
            return jsonify({"status": 'Missing mandatory parameter "repo"'}), 400
        src, dest = data.get("src"), data.get("dest")
        if src is None:
            return jsonify({"status": 'Missing mandatory parameter "src"'}), 400
        if not isinstance(src, int):
            return jsonify({"status": "src node id must be int"}), 400
        if dest is None:
            return jsonify({"status": 'Missing mandatory parameter "dest"'}), 400
        if not isinstance(dest, int):
            return jsonify({"status": "dest node id must be int"}), 400
        if not graph_exists(repo):
            return jsonify({"status": f"Missing project {repo}"}), 400
        paths = service.find_paths(repo, src, dest)
        return jsonify({"status": "success", "paths": paths}), 200

    @app.route("/chat", methods=["POST"])
    @token_required
    def chat():
        data = request.get_json()
        repo, msg = data.get("repo"), data.get("msg")
        if repo is None:
            return jsonify({"status": 'Missing mandatory parameter "repo"'}), 400
        if msg is None:
            return jsonify({"status": 'Missing mandatory parameter "msg"'}), 400
        answer = service.chat(repo, msg)
        return jsonify({"status": "success", "response": answer}), 200

    @app.route("/analyze_folder", methods=["POST"])
    @token_required
    def analyze_folder():
        data = request.get_json()
        path, ignore = data.get("path"), data.get("ignore", [])
        if not path:
            return jsonify({"status": "'path' is required."}), 400
        if not os.path.isdir(path):
            return jsonify({"status": "Invalid path: must be an existing directory"}), 400
        if not isinstance(ignore, list):
            return jsonify({"status": "'ignore' must be a list of paths"}), 400
        result = service.analyze_folder(path, ignore=ignore)
        return jsonify({"status": "success", "project": result["repo"]}), 200

    @app.route("/analyze_repo", methods=["POST"])
    @public_access
    @token_required
    def analyze_repo():
        data = request.get_json()
        url = data.get("repo_url")
        if url is None:
            return jsonify({"status": 'Missing mandatory parameter "url"'}), 400
        service.analyze_repo(url)
        return jsonify({"status": "success"}), 200

    @app.route("/switch_commit", methods=["POST"])
    @public_access
    @token_required
    def switch_commit():
        data = request.get_json()
        repo, commit = data.get("repo"), data.get("commit")
        if repo is None:
            return jsonify({"status": 'Missing mandatory parameter "repo"'}), 400
        if commit is None:
            return jsonify({"status": 'Missing mandatory parameter "commit"'}), 400
        service.switch_commit(repo, commit)
        return jsonify({"status": "success"}), 200

    @app.route("/list_commits", methods=["POST"])
    @public_access
    @token_required
    def list_commits():
        data = request.get_json()
        repo = data.get("repo")
        if repo is None:
            return jsonify({"status": 'Missing mandatory parameter "repo"'}), 400
        commits = service.list_commits(repo)
        return jsonify({"status": "success", "commits": commits}), 200

    return app


def main(argv: list[str] | None = None) -> None:
    """`python -m code_graph_backend_spark.service.http --root DIR` — run
    the API server (the reference runs `flask run` on api/index.py)."""
    import argparse

    from ..session import get_spark

    p = argparse.ArgumentParser(description="code-graph HTTP API")
    p.add_argument("--root", required=True, help="graph storage root directory")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5000)
    args = p.parse_args(argv)
    app = create_app(CodeGraphService(get_spark(), args.root))
    app.run(host=args.host, port=args.port)


if __name__ == "__main__":
    main()
