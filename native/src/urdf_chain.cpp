// Native URDF chain extractor.
//
// TPU-native analogue of the reference's host-side native parsing stack
// (TinyURDFParser + TinyXML2 feeding KDL, KDLRobot.cpp:44-58): a
// self-contained C++17 parser that reads a URDF, resolves the joint path
// between two links, and returns per-joint {type, origin rpy/xyz, axis}
// records through a plain C ABI (consumed from Python via ctypes; fixed-
// joint folding and rotation construction stay in the shared Python path so
// both parsers feed identical downstream code).
//
// The XML subset understood is what URDF uses: elements with attributes,
// comments, processing instructions, CDATA-free bodies. No external deps.

#include <cctype>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Attr {
    std::string name;
    std::string value;
};

struct Tag {
    std::string name;
    std::vector<Attr> attrs;
    bool self_closing = false;
    bool closing = false;
};

// Minimal forward-only XML tokenizer: yields start/end tags with attributes.
class XmlScanner {
public:
    explicit XmlScanner(const std::string& text) : s_(text), pos_(0) {}

    bool next(Tag& out) {
        while (true) {
            size_t lt = s_.find('<', pos_);
            if (lt == std::string::npos) return false;
            if (s_.compare(lt, 4, "<!--") == 0) {  // comment
                size_t end = s_.find("-->", lt);
                if (end == std::string::npos) return false;
                pos_ = end + 3;
                continue;
            }
            if (s_.compare(lt, 2, "<?") == 0) {  // processing instruction
                size_t end = s_.find("?>", lt);
                if (end == std::string::npos) return false;
                pos_ = end + 2;
                continue;
            }
            if (s_.compare(lt, 2, "<!") == 0) {  // doctype etc.
                size_t end = s_.find('>', lt);
                if (end == std::string::npos) return false;
                pos_ = end + 1;
                continue;
            }
            size_t gt = s_.find('>', lt);
            if (gt == std::string::npos) return false;
            parse_tag(s_.substr(lt + 1, gt - lt - 1), out);
            pos_ = gt + 1;
            return true;
        }
    }

private:
    void parse_tag(std::string body, Tag& out) {
        out = Tag{};
        if (!body.empty() && body.back() == '/') {
            out.self_closing = true;
            body.pop_back();
        }
        size_t i = 0;
        if (!body.empty() && body[0] == '/') {
            out.closing = true;
            i = 1;
        }
        while (i < body.size() && !std::isspace((unsigned char)body[i])) {
            out.name += body[i++];
        }
        while (i < body.size()) {
            while (i < body.size() && std::isspace((unsigned char)body[i])) i++;
            if (i >= body.size()) break;
            Attr a;
            while (i < body.size() && body[i] != '=' &&
                   !std::isspace((unsigned char)body[i])) {
                a.name += body[i++];
            }
            while (i < body.size() && std::isspace((unsigned char)body[i])) i++;
            if (i < body.size() && body[i] == '=') {
                i++;
                while (i < body.size() && std::isspace((unsigned char)body[i])) i++;
                if (i < body.size() && (body[i] == '"' || body[i] == '\'')) {
                    char q = body[i++];
                    while (i < body.size() && body[i] != q) a.value += body[i++];
                    if (i < body.size()) i++;
                }
            }
            if (!a.name.empty()) out.attrs.push_back(a);
        }
    }

    const std::string& s_;
    size_t pos_;
};

struct JointRec {
    std::string name, type, parent, child;
    double rpy[3] = {0, 0, 0};
    double xyz[3] = {0, 0, 0};
    double axis[3] = {1, 0, 0};  // URDF default axis
    bool has_axis = false;
};

bool parse_vec3(const std::string& v, double out[3]) {
    std::istringstream ss(v);
    return bool(ss >> out[0] >> out[1] >> out[2]);
}

std::string attr_of(const Tag& t, const char* name) {
    for (const auto& a : t.attrs)
        if (a.name == name) return a.value;
    return "";
}

int parse_joints(const std::string& xml, std::vector<JointRec>& joints) {
    XmlScanner sc(xml);
    Tag tag;
    JointRec* cur = nullptr;
    int depth_in_joint = 0;
    while (sc.next(tag)) {
        if (tag.closing) {
            if (cur) {
                if (tag.name == "joint") {
                    cur = nullptr;
                    depth_in_joint = 0;
                } else if (depth_in_joint > 0) {
                    depth_in_joint--;
                }
            }
            continue;
        }
        if (tag.name == "joint" && !cur) {
            joints.emplace_back();
            cur = &joints.back();
            cur->name = attr_of(tag, "name");
            cur->type = attr_of(tag, "type");
            if (tag.self_closing) cur = nullptr;
            continue;
        }
        if (!cur) continue;
        if (tag.name == "parent") {
            cur->parent = attr_of(tag, "link");
        } else if (tag.name == "child") {
            cur->child = attr_of(tag, "link");
        } else if (tag.name == "origin") {
            std::string rpy = attr_of(tag, "rpy");
            std::string xyz = attr_of(tag, "xyz");
            if (!rpy.empty()) parse_vec3(rpy, cur->rpy);
            if (!xyz.empty()) parse_vec3(xyz, cur->xyz);
        } else if (tag.name == "axis") {
            std::string xyz = attr_of(tag, "xyz");
            if (!xyz.empty() && parse_vec3(xyz, cur->axis)) cur->has_axis = true;
        }
        if (!tag.self_closing && tag.name != "joint") depth_in_joint++;
        if (tag.self_closing && tag.name == "joint") cur = nullptr;
    }
    return (int)joints.size();
}

}  // namespace

extern "C" {

// Parse `source` (path when is_path != 0, else raw XML), walk the joint path
// base_link -> tip_link, and write one record per joint on the path:
//   types[i]   0 fixed, 1 revolute/continuous, 2 prismatic
//   rpy[3i..], xyz[3i..], axis[3i..]
// Returns the number of path joints, or:
//   -1 cannot read file, -2 no path between links, -3 buffer too small,
//   -4 unsupported joint type on the path.
int ilqr_parse_urdf_chain(const char* source, int is_path, const char* base_link,
                          const char* tip_link, int max_joints, int* types,
                          double* rpy, double* xyz, double* axis) {
    std::string xml;
    if (is_path) {
        std::ifstream f(source);
        if (!f) return -1;
        std::stringstream ss;
        ss << f.rdbuf();
        xml = ss.str();
    } else {
        xml = source;
    }

    std::vector<JointRec> joints;
    parse_joints(xml, joints);

    std::map<std::string, const JointRec*> by_child;
    for (const auto& j : joints) by_child[j.child] = &j;

    std::vector<const JointRec*> path;
    std::string link = tip_link;
    while (link != base_link) {
        auto it = by_child.find(link);
        if (it == by_child.end()) return -2;
        path.push_back(it->second);
        link = it->second->parent;
        if ((int)path.size() > (int)joints.size()) return -2;  // cycle guard
    }

    int n = (int)path.size();
    if (n > max_joints) return -3;

    for (int i = 0; i < n; ++i) {
        const JointRec* j = path[n - 1 - i];  // reverse to base->tip order
        int t;
        if (j->type == "fixed") t = 0;
        else if (j->type == "revolute" || j->type == "continuous") t = 1;
        else if (j->type == "prismatic") t = 2;
        else return -4;
        types[i] = t;
        for (int k = 0; k < 3; ++k) {
            rpy[3 * i + k] = j->rpy[k];
            xyz[3 * i + k] = j->xyz[k];
            axis[3 * i + k] = j->axis[k];
        }
    }
    return n;
}

}  // extern "C"
